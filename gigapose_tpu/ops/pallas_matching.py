"""Fused Pallas TPU kernel for template retrieval.

The XLA path (ops/matching.py) materializes the (B, N, P, P) similarity and
a per-batch (B, N, P, C) gather of the template store — both HBM-bandwidth
bound. This kernel fuses the whole per-(detection, template) pipeline into
one VMEM-resident tile program:

    grid (B, N / nV); step (b, g) covers views n = g*nV .. g*nV+nV-1:
        tar tile   (P, C)      <- tar_feat[b]                 [VMEM]
        src tile   (nV, P, C)  <- store_feats[labels[b], g]   [VMEM, HBM-resident
                                                               store indexed via
                                                               scalar prefetch]
        sim        (P, nV*P)   = tar @ src^T                  [MXU, one call]
        per view: masking / threshold / bidirectional argmax / cycle
        consistency / per-template averaged score             [VPU]

so the P x P similarities never touch HBM and the template store is never
copied per batch. Outputs are the per-template scores + matched indices the
top-k / RANSAC stages consume (tiny: O(B x N x P)). `views_per_step` (nV)
amortizes the per-grid-step overhead (block DMA setup, kernel dispatch)
and feeds the MXU one (P, C) x (C, nV*P) matmul instead of nV small ones —
measured 6.33 -> ~4 ms at B=16, V=162, C=1024 on v5e (ROUND_NOTES r2).

Mosaic (TPU) lowering rules shape this kernel (validated on a real v5e chip):
  - the last two dims of every block must be (8k, 128k) or the full array
    dims -> masks ride in as (.., P, 1)/(.., 1, P), small outputs as (.., 1, 1);
  - no scalar or 1-D vector stores/reductions -> every intermediate stays 2-D
    (column (P, 1) / row (1, P)), reductions use keepdims;
  - argmax is expressed as an equality-mask + first-index min-reduction, and
    gathers as one-hot broadcast-multiply + lane reduction (pure VPU).

Semantics are bit-identical to ops/matching.match_templates (which remains
the reference implementation and the fallback on CPU); tests compare the two.
Feature contract: both inputs L2-normalized (AENet output and the template
store are), in any float dtype — accumulation is f32 on the MXU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _match_kernel(
    labels_ref,  # scalar prefetch: (B,) int32
    tar_ref,  # (1, P, C) VMEM
    tar_mask_ref,  # (1, P, 1) VMEM
    src_ref,  # (1, nV, P, C) VMEM <- store[label, g*nV : (g+1)*nV]
    src_mask_ref,  # (1, nV, 1, P) VMEM
    score_ref,  # out (1, nV, 1, 1) sim_avg
    idx_ref,  # out (1, nV, P, 1) int32 idx_t2s
    spts_ref,  # out (1, nV, P, 1) f32 score_t2s
    valid_ref,  # out (1, nV, P, 1) int32 mask_all
    *,
    sim_threshold: float,
    patch_threshold: int,
    num_patches: int,
    views_per_step: int,
):
    P = tar_ref.shape[1]
    C = tar_ref.shape[2]
    nV = views_per_step
    tar = tar_ref[0]  # (P, C)
    tar_m = tar_mask_ref[0].astype(jnp.float32)  # (P, 1) column

    # one MXU call for all nV views: (P, C) x (C, nV*P)
    src_all = src_ref[0].reshape(nV * P, C)  # (nV*P, C)
    sim_all = jax.lax.dot_general(
        tar,
        src_all,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (P_t, nV*P_s)

    # Mosaic's tpu.iota is integer-only; cast for the f32 min-reductions
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1).astype(jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0).astype(jnp.float32)
    eye = (row_ids == col_ids).astype(jnp.float32)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).astype(jnp.float32)
    np_f = float(num_patches)
    t_col = jnp.mod(t_ids, np_f)
    t_row = jnp.floor(t_ids / np_f)

    for v in range(nV):  # static unroll: VPU stage per view
        src_m = src_mask_ref[0, v].astype(jnp.float32)  # (1, P) row
        sim = sim_all[:, v * P:(v + 1) * P] * tar_m * src_m
        sim = jnp.where(sim < sim_threshold, 0.0, sim)

        # first-occurrence argmax along each axis (== jnp.argmax tie behavior)
        score_t2s = jnp.max(sim, axis=1, keepdims=True)  # (P, 1)
        idx_t2s_f = jnp.min(
            jnp.where(sim == score_t2s, col_ids, float(P)), axis=1, keepdims=True
        )  # (P, 1)
        score_s2t = jnp.max(sim, axis=0, keepdims=True)  # (1, P)
        idx_s2t_f = jnp.min(
            jnp.where(sim == score_s2t, row_ids, float(P)), axis=0, keepdims=True
        )  # (1, P)

        mask_sim = score_t2s >= sim_threshold  # (P, 1)

        # cycle consistency: gather row-vector v at idx_t2s via one-hot
        # broadcast-multiply + lane reduction (VPU-only, no transposes)
        onehot = (idx_t2s_f == col_ids).astype(jnp.float32)  # (P, P)
        gather_row = lambda v_row: jnp.sum(onehot * v_row, axis=1, keepdims=True)
        idx_cycle = gather_row(idx_s2t_f)  # (P, 1) f32
        sim_cycle = gather_row(score_s2t)  # (P, 1)
        src_m_at_t2s = gather_row(src_m)  # (P, 1)

        dx = jnp.mod(idx_cycle, np_f) - t_col
        dy = jnp.floor(idx_cycle / np_f) - t_row
        dist = jnp.sqrt(dx * dx + dy * dy)
        mask_cycle = (dist <= patch_threshold) & (sim_cycle >= sim_threshold)

        # the reference's elementwise `idx_s2t != 0` guard reads idx_s2t at the
        # SAME patch position t (ops/matching.py:124-126 replicates
        # matching.py:263-268) -> transpose the row vector via a diagonal gather
        idx_s2t_at_t = jnp.sum(eye * idx_s2t_f, axis=1, keepdims=True)  # (P, 1)
        mask_nonzero = (
            (tar_m > 0) & (src_m_at_t2s > 0) & (idx_s2t_at_t != 0)
            & (idx_t2s_f != 0)
        )
        mask_all = mask_sim & mask_cycle & mask_nonzero  # (P, 1)

        mask_f = mask_all.astype(jnp.float32)
        total = jnp.sum(score_t2s * mask_f, axis=0, keepdims=True)  # (1, 1)
        count = jnp.sum(mask_f, axis=0, keepdims=True)  # (1, 1)
        score_ref[0, v] = jnp.where(count > 0, total / (num_patches**2), 0.0)
        idx_ref[0, v] = idx_t2s_f.astype(jnp.int32)
        spts_ref[0, v] = score_t2s
        valid_ref[0, v] = mask_all.astype(jnp.int32)


def _pick_views_per_step(V: int, P: int, C: int, itemsize: int) -> int:
    """Largest divisor of V whose src tile fits a ~4 MB VMEM budget (the
    pipelined pair of tiles then stays well under v5e VMEM)."""
    budget = 4 * 1024 * 1024
    for nv in (8, 6, 4, 3, 2):
        if V % nv == 0 and nv * P * C * itemsize <= budget:
            return nv
    return 1


def pallas_match_scores(
    tar_feat: jnp.ndarray,  # (B, P, C) L2-normalized query features
    store_feats: jnp.ndarray,  # (O, V, P, C) L2-normalized template store
    tar_mask: jnp.ndarray,  # (B, P)
    store_masks: jnp.ndarray,  # (O, V, P)
    labels: jnp.ndarray,  # (B,) int32 0-based object index
    sim_threshold: float = 0.5,
    patch_threshold: int = 3,
    num_patches: int = 16,
    interpret: bool = False,
    views_per_step: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-(detection, template-view) matching. Returns
    (sim_avg (B, V), idx_t2s (B, V, P), score_t2s (B, V, P), valid (B, V, P))."""
    B, P, C = tar_feat.shape
    O, V = store_feats.shape[:2]
    if jax.default_backend() != "tpu":
        interpret = True  # Mosaic kernels only compile for TPU
    nV = views_per_step or _pick_views_per_step(
        V, P, C, store_feats.dtype.itemsize
    )
    if V % nV != 0:
        raise ValueError(f"views_per_step={nV} must divide V={V}")
    kernel = functools.partial(
        _match_kernel,
        sim_threshold=sim_threshold,
        patch_threshold=patch_threshold,
        num_patches=num_patches,
        views_per_step=nV,
    )
    G = V // nV
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, P, C), lambda b, g, labels: (b, 0, 0)),
            pl.BlockSpec((1, P, 1), lambda b, g, labels: (b, 0, 0)),
            pl.BlockSpec((1, nV, P, C), lambda b, g, labels: (labels[b], g, 0, 0)),
            pl.BlockSpec((1, nV, 1, P), lambda b, g, labels: (labels[b], g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, nV, 1, 1), lambda b, g, labels: (b, g, 0, 0)),
            pl.BlockSpec((1, nV, P, 1), lambda b, g, labels: (b, g, 0, 0)),
            pl.BlockSpec((1, nV, P, 1), lambda b, g, labels: (b, g, 0, 0)),
            pl.BlockSpec((1, nV, P, 1), lambda b, g, labels: (b, g, 0, 0)),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((B, V, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, V, P, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, V, P, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, V, P, 1), jnp.int32),
    ]
    score4, idx4, spts4, valid4 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # grid steps are independent -> let Mosaic split them across
            # tensor cores where the chip has more than one
            dimension_semantics=("parallel", "parallel"),
        ),
    )(
        labels.astype(jnp.int32),
        tar_feat,
        tar_mask[:, :, None],
        store_feats,
        store_masks[:, :, None, :],
    )
    return (
        score4[:, :, 0, 0],
        idx4[:, :, :, 0],
        spts4[:, :, :, 0],
        valid4[:, :, :, 0],
    )


def pallas_match_templates(
    tar_feat: jnp.ndarray,
    store_feats: jnp.ndarray,
    tar_mask: jnp.ndarray,
    store_masks: jnp.ndarray,
    labels: jnp.ndarray,
    k: int = 5,
    sim_threshold: float = 0.5,
    patch_threshold: int = 3,
    num_patches: int = 16,
    interpret: bool = False,
    views_per_step: int | None = None,
):
    """Drop-in for ops.matching.match_templates but reading the store
    directly (no per-batch gather). Returns the same MatchResult."""
    from gigapose_tpu.ops.gather import patch_index_to_location
    from gigapose_tpu.ops.matching import MatchResult

    B, P, _ = tar_feat.shape
    sim_avg, idx_t2s, score_t2s, valid = pallas_match_scores(
        tar_feat, store_feats, tar_mask, store_masks, labels,
        sim_threshold, patch_threshold, num_patches, interpret=interpret,
        views_per_step=views_per_step,
    )
    scores, ids = jax.lax.top_k(sim_avg, k)
    take = lambda a: jnp.take_along_axis(a, ids[..., None], axis=1)
    sel_valid = take(valid).astype(bool)
    sel_spts = take(score_t2s)
    sel_src = patch_index_to_location(take(idx_t2s), num_patches)
    grid = patch_index_to_location(jnp.arange(P), num_patches)
    tar_pts = jnp.where(
        sel_valid[..., None], jnp.broadcast_to(grid, (B, k, P, 2)), -1.0
    )
    src_pts = jnp.where(sel_valid[..., None], sel_src, -1.0)
    return MatchResult(
        ids=ids.astype(jnp.int32),
        scores=scores,
        score_pts=sel_spts,
        src_pts=src_pts,
        tar_pts=tar_pts,
        valid=sel_valid,
    )
