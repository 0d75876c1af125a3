"""One-correspondence 2D-affine RANSAC, fully vectorized.

Rebuild of the reference's RANSAC (src/models/ransac.py:9-172). Each valid
correspondence n proposes the complete affine map on its own — its regressed
scale and cos/sin fix the linear part, the point pair fixes the translation —
so "RANSAC" degenerates into a dense (N proposals x N validators) error
matrix plus an argmax, which is exactly what TPUs like.

The reference loops detections in Python and compacts valid correspondences
(ransac.py:134-165); here everything is a fixed-shape masked batch op under
vmap, bit-matching its scoring semantics:
- proposals come only from valid correspondences,
- each proposal is validated on all *other* valid correspondences
  (leave-one-out, ransac.py:19-35),
- inlier score = sum of matching scores of inliers (err <= pixel_threshold),
- best proposal by score; ties resolve to the lowest index, which matches
  torch.max over the reference's order-preserving compaction,
- failed = best score == 0; zero valid points leaves M = I and failed = False
  (ransac.py:140, the reference skips such rows leaving the init values).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RansacResult(NamedTuple):
    M: jnp.ndarray  # (..., 3, 3) best affine (patch->patch, pixel units)
    failed: jnp.ndarray  # (...,) bool
    inliers: jnp.ndarray  # (..., N) bool — inliers of the best proposal (excl. itself)
    inlier_scores: jnp.ndarray  # (..., N) f32 — score where inlier else 0


def ransac_affine(
    src_pts: jnp.ndarray,
    tar_pts: jnp.ndarray,
    scores: jnp.ndarray,
    rel_scale: jnp.ndarray,
    rel_cossin: jnp.ndarray,
    valid: jnp.ndarray,
    pixel_threshold: float = 14.0,
    patch_size: int = 14,
) -> RansacResult:
    """Args (leading batch axes broadcast; core axis is N correspondences):
        src_pts:    (..., N, 2) template patch coords (patch units).
        tar_pts:    (..., N, 2) query patch coords (patch units).
        scores:     (..., N) matching scores (validation weights).
        rel_scale:  (..., N) per-correspondence relative 2D scale.
        rel_cossin: (..., N, 2) per-correspondence [cos, sin] of in-plane angle.
        valid:      (..., N) bool.
    Returns RansacResult with pixel-unit affines.
    """
    dtype = src_pts.dtype
    src = src_pts * patch_size
    tar = tar_pts * patch_size

    c, s = rel_cossin[..., 0], rel_cossin[..., 1]
    sc = rel_scale
    # linear part of each proposal: scale * R(theta), (..., N, 2, 2)
    a11, a12 = sc * c, -sc * s
    a21, a22 = sc * s, sc * c
    # translation from the proposal's own point pair
    tx = tar[..., 0] - (a11 * src[..., 0] + a12 * src[..., 1])
    ty = tar[..., 1] - (a21 * src[..., 0] + a22 * src[..., 1])

    # error of proposal n on validator m: (..., N, M)
    px = (
        a11[..., :, None] * src[..., None, :, 0]
        + a12[..., :, None] * src[..., None, :, 1]
        + tx[..., :, None]
    )
    py = (
        a21[..., :, None] * src[..., None, :, 0]
        + a22[..., :, None] * src[..., None, :, 1]
        + ty[..., :, None]
    )
    err = jnp.sqrt(
        (tar[..., None, :, 0] - px) ** 2 + (tar[..., None, :, 1] - py) ** 2
    )

    N = src_pts.shape[-2]
    not_self = ~jnp.eye(N, dtype=bool)
    inlier = (
        (err <= pixel_threshold)
        & valid[..., None, :]
        & valid[..., :, None]
        & not_self
    )
    score_inliers = jnp.sum(inlier * scores[..., None, :], axis=-1)  # (..., N)
    score_inliers = jnp.where(valid, score_inliers, -jnp.inf)

    best = jnp.argmax(score_inliers, axis=-1)  # (...,)
    best_score = jnp.take_along_axis(score_inliers, best[..., None], axis=-1)[..., 0]
    any_valid = jnp.any(valid, axis=-1)
    failed = any_valid & (best_score == 0)

    def take_best(x):  # (..., N) -> (...,) picked at the best proposal
        return jnp.take_along_axis(x, best[..., None], axis=-1)[..., 0]

    bM = jnp.stack(
        [
            jnp.stack([take_best(a11), take_best(a12), take_best(tx)], axis=-1),
            jnp.stack([take_best(a21), take_best(a22), take_best(ty)], axis=-1),
        ],
        axis=-2,
    )  # (..., 2, 3)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=dtype), bM.shape[:-2] + (1, 3)
    )
    M = jnp.concatenate([bM, bottom], axis=-2)
    # rows with zero valid correspondences keep identity (reference skips them)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), M.shape)
    M = jnp.where(any_valid[..., None, None], M, eye)

    best_inliers = jnp.take_along_axis(
        inlier, best[..., None, None], axis=-2
    )[..., 0, :] & any_valid[..., None]
    inlier_scores = jnp.where(best_inliers, scores, 0.0)
    return RansacResult(M=M, failed=failed, inliers=best_inliers, inlier_scores=inlier_scores)
