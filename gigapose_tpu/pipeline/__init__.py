from gigapose_tpu.pipeline.templates import TemplateStore, onboard_templates
from gigapose_tpu.pipeline.estimator import (
    GigaPoseEstimator,
    CoarsePrediction,
    DetectionBatch,
)
