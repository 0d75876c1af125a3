from gigapose_tpu.utils.timer import Timer
from gigapose_tpu.utils.logging import get_logger
