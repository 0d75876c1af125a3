"""Closed-form 6D pose recovery from 2D affine hypotheses.

Rebuild of the reference's ObjectPoseRecovery._forward_recovery
(src/models/poses.py:26-101): given the query crop transform and intrinsics,
the retrieved template view id, and the RANSAC affine M mapping template crop
pixels to query crop pixels, recover the full object pose:

1. rotation  R = normalize(M) @ R_template            (in-plane x viewpoint)
2. 2D center: chase the template's projected center through the affine chain
   inv(query_crop_M) @ M @ template_crop_M
3. depth     z = (z_template / scale2d(M_chain)) * (f_query / f_template)
4. t = z * normalize(K_query^-1 @ center_homogeneous)

All matrix algebra is tiny (3x3/4x4), so it is pinned to full-precision
contractions regardless of the backend's default matmul precision.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from gigapose_tpu.lib3d.affine import inverse_crop_affine, normalize_affine

einsum = partial(jnp.einsum, precision="highest")


def recover_poses(
    query_M: jnp.ndarray,
    query_K: jnp.ndarray,
    view_ids: jnp.ndarray,
    pred_Ms: jnp.ndarray,
    template_K: jnp.ndarray,
    template_Ms: jnp.ndarray,
    template_poses: jnp.ndarray,
) -> jnp.ndarray:
    """Args:
        query_M:        (B, 3, 3) query crop affine.
        query_K:        (B, 3, 3) query intrinsics.
        view_ids:       (B, k) int — retrieved template view indices.
        pred_Ms:        (B, k, 3, 3) RANSAC affines (template crop -> query crop).
        template_K:     (B, 3, 3) template intrinsics (per object).
        template_Ms:    (B, V, 3, 3) crop affines of all V templates.
        template_poses: (B, V, 4, 4) object poses of all V templates.
    Returns:
        (B, k, 4, 4) recovered object poses in the query camera.
    """
    B, k = view_ids.shape
    gather_33 = lambda a: jnp.take_along_axis(
        a, view_ids[..., None, None].astype(jnp.int32), axis=1, mode="clip"
    )
    temp_Ms = gather_33(jnp.broadcast_to(template_Ms, (B,) + template_Ms.shape[-3:]))
    temp_poses = jnp.take_along_axis(
        template_poses, view_ids[..., None, None].astype(jnp.int32), axis=1, mode="clip"
    )  # (B, k, 4, 4)

    # Step 1: rotation = in-plane (from the affine) on top of the template view
    R_inplane = normalize_affine(pred_Ms)  # (B, k, 3, 3), pure rotation
    R = einsum("bkij,bkjl->bkil", R_inplane, temp_poses[..., :3, :3])

    # Step 2: template object center in template image pixels
    temp_z = temp_poses[..., 2, 3]
    center_t = einsum("bij,bkj->bki", template_K, temp_poses[..., :3, 3])
    center_t = center_t / center_t[..., 2:3]  # homogeneous pixel (x, y, 1)

    # full 2D chain from template image to query image
    inv_query_M = inverse_crop_affine(query_M)  # (B, 3, 3)
    affine2d = einsum(
        "bij,bkjl,bklm->bkim", inv_query_M, pred_Ms, temp_Ms
    )  # (B, k, 3, 3)
    center_q = einsum("bkij,bkj->bki", affine2d, center_t)  # (B, k, 3)

    # Step 3: depth from the 2D scale of the full chain + focal ratio
    scale2d = jnp.linalg.norm(affine2d[..., :2, 0], axis=-1)
    focal_ratio = query_K[..., None, 0, 0] / template_K[..., None, 0, 0]
    query_z = (temp_z / scale2d) * focal_ratio

    # Step 4: translation along the ray through the recovered 2D center
    inv_query_K = jnp.linalg.inv(query_K)
    ray = einsum("bij,bkj->bki", inv_query_K, center_q)
    ray = ray / ray[..., 2:3]
    t = ray * query_z[..., None]

    poses = jnp.concatenate(
        [
            jnp.concatenate([R, t[..., None]], axis=-1),
            jnp.broadcast_to(
                jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), (B, k, 1, 4)
            ),
        ],
        axis=-2,
    )
    return poses
