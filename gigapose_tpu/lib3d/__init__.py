from gigapose_tpu.lib3d.affine import (
    affine2d,
    apply_affine,
    homogeneous,
    inverse_crop_affine,
    normalize_affine,
    affine_scale,
)
from gigapose_tpu.lib3d.geometry import (
    cos_sin,
    cos_sin_to_angle,
    project_points,
    unproject_points,
    euler_z_zxy,
    euler_z_zyx,
    relative_scale,
    relative_inplane,
    geodesic_distance_cos_sin,
    opencv_to_opengl,
    rotation_geodesic_deg,
    inplane_to_rotation,
    compute_inplane_deg,
)
from gigapose_tpu.lib3d.icosphere import (
    icosphere_views,
    template_object_poses,
    template_camera_poses,
    nearest_template_index,
)
