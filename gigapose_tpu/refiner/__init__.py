from gigapose_tpu.refiner.ops import (
    project_points_robust,
    boxes_from_uv,
    deepim_boxes,
    get_K_crop_resize,
    rotation_from_ortho6d,
    normalize_T,
    pose_update_with_reference_point,
    crop_images_to_boxes,
)
from gigapose_tpu.refiner.network import RefinerNet, CoarseScorerNet
from gigapose_tpu.refiner.refiner import RenderCompareRefiner, RefinerConfig
