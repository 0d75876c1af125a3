"""Template retrieval by dense patch-feature similarity + cycle consistency.

TPU-native rebuild of the reference's hot kernel (LocalSimilarity.test,
src/models/matching.py:188-316): for each query crop, compute the cosine
similarity of its P=256 patch features against all N templates x P patches of
its object, find mutual nearest neighbors with cycle consistency, average
per-template similarity, and return the top-k templates with their matched
patch correspondences.

Design differences from the reference (same outputs):
- One jitted function, fixed shapes, no chunking loop: the (B, N, P, P)
  similarity is produced by a single einsum that XLA tiles onto the MXU.
- Validity is a bool mask; the -1 coordinate convention is reconstructed only
  in the returned point arrays so downstream/host code can keep the reference
  contract.
- `val` mode (B pairs of images, used by the training/validation metric) is
  the N=1 special case.

Semantics replicated exactly, including the reference's quirks:
- sim thresholded to 0 *before* arg-maxing, so argmax of an all-zero row is 0
  and the `idx != 0` guards drop patch 0 matches (matching.py:236,263-268).
- the `(idx_src2tar != 0)` guard multiplies elementwise at query-patch
  positions even though the array is indexed by template patch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gigapose_tpu.ops.gather import patch_index_to_location


class MatchResult(NamedTuple):
    """Top-k template matches for each query crop (all fixed-shape)."""

    ids: jnp.ndarray  # (B, k) int32 — template (view) indices
    scores: jnp.ndarray  # (B, k) f32 — averaged patch similarity per template
    score_pts: jnp.ndarray  # (B, k, P) f32 — per-query-patch best similarity
    src_pts: jnp.ndarray  # (B, k, P, 2) f32 — matched template patch [x,y]; -1 invalid
    tar_pts: jnp.ndarray  # (B, k, P, 2) f32 — query patch [x,y]; -1 invalid
    valid: jnp.ndarray  # (B, k, P) bool — correspondence validity


def downsample_mask(mask: jnp.ndarray, num_patches: int) -> jnp.ndarray:
    """(..., H, W) image-resolution mask -> (..., P) patch-resolution flat mask
    by nearest sampling (matches F.interpolate(mode='nearest') used at
    matching.py:211-216: picks pixel floor(i * H / num_patches))."""
    H, W = mask.shape[-2], mask.shape[-1]
    ys = (jnp.arange(num_patches) * H) // num_patches
    xs = (jnp.arange(num_patches) * W) // num_patches
    m = mask[..., ys, :][..., :, xs]
    return m.reshape(mask.shape[:-2] + (num_patches * num_patches,))


def match_templates(
    tar_feat: jnp.ndarray,
    src_feats: jnp.ndarray,
    tar_mask: jnp.ndarray,
    src_masks: jnp.ndarray,
    k: int = 5,
    sim_threshold: float = 0.5,
    patch_threshold: int = 3,
    num_patches: int = 16,
    search_direction: str = "tar2src",
) -> MatchResult:
    """Args:
        tar_feat:  (B, P, C) query patch features (will be L2-normalized).
        src_feats: (B, N, P, C) template patch features of each query's object.
        tar_mask:  (B, P) float/bool patch-level query mask.
        src_masks: (B, N, P) patch-level template masks.
        search_direction: "tar2src" (default) anchors correspondences on query
            patches; "src2tar" anchors on template patches (the reference's
            LocalSimilarity.search_direction switch, matching.py:241-246 —
            it swaps which axis the primary argmax reduces).
    Returns MatchResult with top-k templates per query.
    """
    B, N, P, C = src_feats.shape
    tar_f = tar_feat / jnp.linalg.norm(tar_feat, axis=-1, keepdims=True).clip(1e-8)
    src_f = src_feats / jnp.linalg.norm(src_feats, axis=-1, keepdims=True).clip(1e-8)
    tar_m = tar_mask.astype(tar_f.dtype)
    src_m = src_masks.astype(src_f.dtype)

    # (B, N, P_tar, P_src) similarity — the MXU hot loop
    sim = jnp.einsum("btc,bnsc->bnts", tar_f, src_f)
    sim = sim * src_m[:, :, None, :] * tar_m[:, None, :, None]
    sim = jnp.where(sim < sim_threshold, 0.0, sim)

    # nearest neighbors both directions
    if search_direction == "tar2src":
        score_t2s = jnp.max(sim, axis=3)  # (B, N, P) best template patch / query patch
        idx_t2s = jnp.argmax(sim, axis=3)
        score_s2t = jnp.max(sim, axis=2)  # (B, N, P) best query patch / template patch
        idx_s2t = jnp.argmax(sim, axis=2)
    elif search_direction == "src2tar":
        score_t2s = jnp.max(sim, axis=2)
        idx_t2s = jnp.argmax(sim, axis=2)
        score_s2t = jnp.max(sim, axis=3)
        idx_s2t = jnp.argmax(sim, axis=3)
    else:
        raise ValueError(search_direction)

    mask_sim = score_t2s >= sim_threshold

    # cycle consistency: query patch t -> template patch j -> query patch t'
    # must land within patch_threshold of t, with sim above threshold
    # (ref: find_consistency_patches, matching.py:80-113)
    if patch_threshold > 0:
        idx_cycle = jnp.take_along_axis(idx_s2t, idx_t2s, axis=2)  # (B, N, P)
        sim_cycle = jnp.take_along_axis(score_s2t, idx_t2s, axis=2)
        loc_cycle = patch_index_to_location(idx_cycle, num_patches)
        loc_gt = patch_index_to_location(
            jnp.broadcast_to(jnp.arange(P), (B, N, P)), num_patches
        )
        dist = jnp.linalg.norm(loc_cycle - loc_gt, axis=-1)
        mask_cycle = (dist <= patch_threshold) & (sim_cycle >= sim_threshold)
    else:
        mask_cycle = jnp.ones_like(mask_sim)

    # both endpoints inside masks + the reference's idx != 0 guards
    mask_t2s = jnp.take_along_axis(src_m, idx_t2s, axis=2) > 0
    mask_nonzero = (
        (tar_m[:, None, :] > 0) & mask_t2s & (idx_s2t != 0) & (idx_t2s != 0)
    )

    mask_all = mask_sim & mask_cycle & mask_nonzero  # (B, N, P)

    # per-template averaged similarity over valid correspondences
    any_valid = jnp.sum(mask_all, axis=2) > 0
    sim_avg = jnp.where(
        any_valid, jnp.sum(score_t2s * mask_all, axis=2) / (num_patches**2), 0.0
    )
    scores, ids = jax.lax.top_k(sim_avg, k)  # (B, k)

    # gather the chosen templates' correspondences
    take = lambda a: jnp.take_along_axis(a, ids[..., None], axis=1)
    sel_valid = take(mask_all)  # (B, k, P)
    sel_score_pts = take(score_t2s)
    sel_src_loc = patch_index_to_location(take(idx_t2s), num_patches)  # (B, k, P, 2)

    # reference coordinate convention: -1 where invalid; tar pts are the query
    # patch grid itself (format_prediction, matching.py:29-61)
    grid = patch_index_to_location(jnp.arange(P), num_patches)  # (P, 2)
    tar_pts = jnp.where(sel_valid[..., None], jnp.broadcast_to(grid, (B, k, P, 2)), -1.0)
    src_pts = jnp.where(sel_valid[..., None], sel_src_loc, -1.0)

    return MatchResult(
        ids=ids.astype(jnp.int32),
        scores=scores,
        score_pts=sel_score_pts,
        src_pts=src_pts,
        tar_pts=tar_pts,
        valid=sel_valid,
    )


def match_pair(
    src_feat: jnp.ndarray,
    tar_feat: jnp.ndarray,
    src_mask: jnp.ndarray,
    tar_mask: jnp.ndarray,
    sim_threshold: float = 0.5,
    patch_threshold: int = 3,
    num_patches: int = 16,
):
    """Single src/tar pair per sample (the reference's LocalSimilarity.val,
    matching.py:115-186, used by the val/matching metric): the N=1 case of
    match_templates with k=1. Returns (src_pts, tar_pts, valid, score_pts)."""
    r = match_templates(
        tar_feat,
        src_feat[:, None],
        tar_mask,
        src_mask[:, None],
        k=1,
        sim_threshold=sim_threshold,
        patch_threshold=patch_threshold,
        num_patches=num_patches,
    )
    return r.src_pts[:, 0], r.tar_pts[:, 0], r.valid[:, 0], r.score_pts[:, 0]
