from gigapose_tpu.ops.gather import gather_patches, patch_index_to_location
from gigapose_tpu.ops.crop import crop_resize_affine, warp_affine_nearest, crop_resize_pad
from gigapose_tpu.ops.matching import match_templates, MatchResult
from gigapose_tpu.ops.ransac import ransac_affine, RansacResult
from gigapose_tpu.ops.pose_recovery import recover_poses
