"""GT patch-correspondence sampler — pure JAX, vmappable.

Rebuild of the reference's KeyPointSampler (src/dataloader/keypoints.py:97-207):
starting from the 16x16 grid of patch centers in each crop,

1. mask lookup in both crops,
2. uncrop to the full image (inverse crop affine), unproject with the depth
   map, apply the relative SE3, reproject into the other view, recrop,
3. mask lookup again, prune correspondences whose reprojection disagrees
   (min-distance >= 1000 px against the source grid),
4. return patch-unit coordinates with the reference's -1-invalid convention.

The reference runs this per-sample inside dataloader workers with torch; here
it is a fixed-shape jitted function so the whole training batch's GT can be
produced on device (or on host CPU via jax) without Python loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gigapose_tpu.lib3d.affine import apply_affine, inverse_crop_affine
from gigapose_tpu.lib3d.geometry import project_points, transform_points

MAX_DIST = 1000.0


class KeypointView(NamedTuple):
    """Per-view inputs (batched): intrinsics, full-res depth, crop mask, crop M."""

    K: jnp.ndarray  # (B, 3, 3)
    depth: jnp.ndarray  # (B, H, W) full-image depth (meters or mm, consistent)
    mask: jnp.ndarray  # (B, h, w) crop-resolution object mask (0/1)
    M: jnp.ndarray  # (B, 3, 3) crop affine


def _grid_centers(tar_size: int, patch_size: int) -> jnp.ndarray:
    """(P, 2) patch-center pixel coords in crop space, [x, y] order matching
    the reference's (yy, xx) stack read as (x, y) columns after its swap."""
    xs = jnp.arange(0, tar_size, patch_size, dtype=jnp.float32) + patch_size / 2
    gy, gx = jnp.meshgrid(xs, xs, indexing="ij")
    # reference stacks [yy, xx] then treats col0 as x downstream via
    # points[..., 0]; its meshgrid(y, x) makes col0 vary over rows = y... but
    # the subsequent mask()/affine ops index [:, :, 0] as x. Net effect for a
    # square grid: col0 = x. We emit [x, y] directly.
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def _mask_lookup(points: jnp.ndarray, mask: jnp.ndarray, valid: jnp.ndarray):
    """valid &= point inside image bounds and mask>=0.5 at its integer pixel
    (ref: Keypoint.mask, keypoints.py:50-68)."""
    H, W = mask.shape[-2], mask.shape[-1]
    x = points[..., 0]
    y = points[..., 1]
    inside = (x >= 0) & (y >= 0) & (x < W) & (y < H)
    xi = jnp.clip(x.astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, H - 1)
    m = jnp.take_along_axis(
        mask.reshape(mask.shape[:-2] + (H * W,)), yi * W + xi, axis=-1
    )
    return valid & inside & (m >= 0.5)


def _depth_lookup(points: jnp.ndarray, K: jnp.ndarray, depth: jnp.ndarray):
    """Unproject (B, P, 2) pixel points through (B, H, W) depth."""
    H, W = depth.shape[-2], depth.shape[-1]
    xi = jnp.clip(points[..., 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(points[..., 1].astype(jnp.int32), 0, H - 1)
    d = jnp.take_along_axis(
        depth.reshape(depth.shape[:-2] + (H * W,)), yi * W + xi, axis=-1
    )
    ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
    pts_h = jnp.concatenate([points, ones], axis=-1)
    rays = jnp.einsum(
        "...ij,...nj->...ni", jnp.linalg.inv(K), pts_h, precision="highest"
    )
    return rays * d[..., None]


def sample_keypoints(
    T_src2tar: jnp.ndarray,
    src: KeypointView,
    tar: KeypointView,
    tar_size: int = 224,
    patch_size: int = 14,
):
    """Returns dict(src_pts, tar_pts) of (B, P, 2) patch-unit coords (-1 invalid).

    src_pts are the *reprojected template* locations matched to tar_pts (the
    query's own grid), exactly the contract the training losses and the IST
    net consume (ref: sample_pts output, keypoints.py:123-207).
    """
    B = T_src2tar.shape[0]
    P_side = tar_size // patch_size
    grid = jnp.broadcast_to(_grid_centers(tar_size, patch_size), (B, P_side**2, 2))

    # 1. in-crop mask checks
    src_valid = _mask_lookup(grid, src.mask, jnp.ones(grid.shape[:-1], bool))
    tar_valid = _mask_lookup(grid, tar.mask, jnp.ones(grid.shape[:-1], bool))

    # 2. crop -> full image
    src_full = apply_affine(inverse_crop_affine(src.M), grid)
    tar_full = apply_affine(inverse_crop_affine(tar.M), grid)

    # 3. unproject with depth, transform src->tar, reproject into tar's camera
    src_3d = _depth_lookup(src_full, src.K, src.depth)
    src_in_tar_3d = transform_points(T_src2tar, src_3d)
    src_reproj = project_points(src_in_tar_3d, tar.K)  # full-image pixels in tar
    # 4. back into tar's crop
    src_in_tar_crop = apply_affine(tar.M, src_reproj)
    # masked by tar's crop mask (ref: reproj mask step)
    src_valid = _mask_lookup(src_in_tar_crop, tar.mask, src_valid)
    # depth==0 pixels unproject to the origin; kill them
    src_valid &= src_3d[..., 2] > 1e-8

    # 5. consistency prune: reprojected src points must land near the grid of
    # valid tar points (ref's cdist min-distance < 1000 check)
    d2 = jnp.sum(
        (src_in_tar_crop[:, :, None, :] - grid[:, None, :, :]) ** 2, axis=-1
    )  # (B, P, P)
    d2 = jnp.where(tar_valid[:, None, :], d2, jnp.inf)
    min_d = jnp.sqrt(jnp.min(d2, axis=-1))
    src_valid &= min_d < MAX_DIST

    valid = src_valid & tar_valid

    src_pts = jnp.where(valid[..., None], src_in_tar_crop / patch_size, -1.0)
    tar_pts = jnp.where(valid[..., None], grid / patch_size, -1.0)
    # the reference floors via .long() when gathering features; keep float
    # patch coords here (consumers floor), matching convert_to_patch_coordinates
    return {"src_pts": src_pts, "tar_pts": tar_pts, "valid": valid}
