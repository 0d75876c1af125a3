"""Projective + rotation geometry, pure JAX (vmap/jit-safe).

Capability parity with the reference's src/lib3d/torch.py (project/unproject,
cosSin, get_relative_scale_inplane, geodesic_distance) and src/lib3d/numpy.py
(opencv2opengl, geodesic) and src/lib3d/template_transform.py (compute_inplane),
but with no scipy on the hot path: the Euler-angle extractions the reference
does via scipy.Rotation are closed-form here so they run under jit on device.
"""

from __future__ import annotations

import jax.numpy as jnp
from functools import partial

# pose/geometry matrices are tiny; always contract in full f32 so results
# do not drift with the backend's default (possibly bf16) matmul precision
einsum = partial(jnp.einsum, precision="highest")

TWO_PI = 2.0 * jnp.pi


def cos_sin(angle: jnp.ndarray) -> jnp.ndarray:
    """(...,) angle -> (..., 2) [cos, sin] (ref: cosSin, src/lib3d/torch.py:134)."""
    return jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)


def cos_sin_to_angle(cs: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) [cos, sin] -> angle in [0, 2pi) (ref: cosSin_inv)."""
    return jnp.mod(jnp.arctan2(cs[..., 1], cs[..., 0]), TWO_PI)


def project_points(points3d: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) x (..., 3, 3) -> (..., N, 2) pixel coords (ref: project_points)."""
    p = einsum("...ij,...nj->...ni", K, points3d)
    return p[..., :2] / p[..., 2:3]


def unproject_points(
    points2d: jnp.ndarray,
    K: jnp.ndarray,
    depth: jnp.ndarray,
) -> jnp.ndarray:
    """Lift (..., N, 2) pixel coords to camera space using a (..., H, W) depth map.

    Depth is sampled at the rounded-down integer pixel (same as the reference's
    long() cast, src/lib3d/torch.py:96-106), with coordinates clamped to bounds.
    Invalid (< 0) coordinates clamp to 0 and yield whatever depth lives there;
    callers carry validity masks, matching reference behavior.
    """
    H, W = depth.shape[-2], depth.shape[-1]
    x = jnp.clip(points2d[..., 0].astype(jnp.int32), 0, W - 1)
    y = jnp.clip(points2d[..., 1].astype(jnp.int32), 0, H - 1)
    d = jnp.take_along_axis(
        depth.reshape(depth.shape[:-2] + (H * W,)), y * W + x, axis=-1
    )
    pts_h = jnp.concatenate(
        [points2d, jnp.ones(points2d.shape[:-1] + (1,), points2d.dtype)], axis=-1
    )
    K_inv = jnp.linalg.inv(K)
    rays = einsum("...ij,...nj->...ni", K_inv, pts_h)
    return rays * d[..., None]


def transform_points(T: jnp.ndarray, points3d: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) SE3 to (..., N, 3) points."""
    return (
        einsum("...ij,...nj->...ni", T[..., :3, :3], points3d) + T[..., None, :3, 3]
    )


def euler_z_zxy(R: jnp.ndarray) -> jnp.ndarray:
    """First angle of the extrinsic z-x-y Euler decomposition of (..., 3, 3) R.

    Closed form for what the reference computes with
    scipy Rotation.as_euler("zxy")[:, 0] (src/lib3d/torch.py:137-152):
    R = Ry(c) @ Rx(b) @ Rz(a)  =>  R[1,0] = cos(b) sin(a), R[1,1] = cos(b) cos(a),
    so a = atan2(R[1,0], R[1,1]).
    """
    return jnp.arctan2(R[..., 1, 0], R[..., 1, 1])


def euler_z_zyx(R: jnp.ndarray) -> jnp.ndarray:
    """First angle of the extrinsic z-y-x Euler decomposition of (..., 3, 3) R.

    Closed form for scipy Rotation.as_euler("zyx")[0] used by the reference's
    extract_inplane_from_pose (src/lib3d/template_transform.py:11-13):
    R = Rx(c) @ Ry(b) @ Rz(a)  =>  R[0,0] = cos(b) cos(a), R[0,1] = -cos(b) sin(a),
    so a = atan2(-R[0,1], R[0,0]).
    """
    return jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])


def relative_scale(
    src_K: jnp.ndarray,
    tar_K: jnp.ndarray,
    src_pose: jnp.ndarray,
    tar_pose: jnp.ndarray,
    src_M: jnp.ndarray,
    tar_M: jnp.ndarray,
) -> jnp.ndarray:
    """2D scale of the source->target mapping (ref: get_relative_scale_inplane,
    src/lib3d/torch.py:137-152): (z_src/z_tar) * (|tar_M|/|src_M|) / (f_src/f_tar)."""
    rel_z = src_pose[..., 2, 3] / tar_pose[..., 2, 3]
    rel_crop = jnp.linalg.norm(tar_M[..., :2, 0], axis=-1) / jnp.linalg.norm(
        src_M[..., :2, 0], axis=-1
    )
    rel_focal = src_K[..., 0, 0] / tar_K[..., 0, 0]
    return rel_z * rel_crop / rel_focal


def relative_inplane(src_pose: jnp.ndarray, tar_pose: jnp.ndarray) -> jnp.ndarray:
    """In-plane rotation angle in [0, 2pi) of R_tar @ R_src^T about the camera z
    axis (ref: get_relative_scale_inplane's scipy euler-zxy path)."""
    rel_R = einsum("...ij,...kj->...ik", tar_pose[..., :3, :3], src_pose[..., :3, :3]
    )
    return jnp.mod(euler_z_zxy(rel_R) + TWO_PI, TWO_PI)


def geodesic_distance_cos_sin(
    pred_cs: jnp.ndarray, gt_cs: jnp.ndarray, normalize: bool = False, eps: float = 0.0
) -> jnp.ndarray:
    """Mean angular distance between (..., 2) cos/sin pairs (ref: geodesic_distance,
    src/lib3d/torch.py:179-192)."""
    if normalize:
        pred_cs = pred_cs / jnp.linalg.norm(pred_cs, axis=-1, keepdims=True)
        gt_cs = gt_cs / jnp.linalg.norm(gt_cs, axis=-1, keepdims=True)
    cos_diff = jnp.clip(jnp.sum(pred_cs * gt_cs, axis=-1), -1.0 + eps, 1.0 - eps)
    return jnp.mean(jnp.arccos(cos_diff))


# numpy so importing this module never initializes a device backend
_CV2GL = __import__("numpy").diag([1.0, -1.0, -1.0, 1.0])


def opencv_to_opengl(T: jnp.ndarray) -> jnp.ndarray:
    """Flip y/z camera axes: OpenCV <-> OpenGL (involution). Ref: opencv2opengl,
    src/lib3d/numpy.py:44-50. Works on (..., 4, 4)."""
    return einsum("ij,...jk->...ik", jnp.asarray(_CV2GL, T.dtype), T)


def rotation_geodesic_deg(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic distance in degrees between (..., 3, 3) rotations (ref: geodesic,
    src/lib3d/numpy.py:69-72)."""
    tr = einsum("...ij,...ij->...", R2, R1)  # trace(R2 @ R1^T)
    theta = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(theta))


def inplane_to_rotation(inplane_deg: jnp.ndarray) -> jnp.ndarray:
    """Rz(-inplane_deg) as (..., 3, 3) (ref: convert_inplane_to_rotation,
    src/lib3d/template_transform.py:16-18)."""
    a = jnp.deg2rad(-inplane_deg)
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def compute_inplane_deg(
    rot_query_cv: jnp.ndarray, rot_template_cv: jnp.ndarray
) -> jnp.ndarray:
    """In-plane angle (degrees) between query and template rotations (ref:
    compute_inplane, src/lib3d/template_transform.py:27-36): the z-Euler (zyx)
    angle of R_template @ R_query^T."""
    delta = einsum("...ij,...kj->...ik", rot_template_cv, rot_query_cv)
    return jnp.degrees(euler_z_zyx(delta))
