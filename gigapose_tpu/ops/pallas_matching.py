"""Fused Pallas TPU kernel for template retrieval.

The XLA path (ops/matching.py) materializes the (B, N, P, P) similarity and
a per-batch (B, N, P, C) gather of the template store — both HBM-bandwidth
bound. This kernel fuses the whole per-(detection, template) pipeline into
one VMEM-resident tile program:

    grid (B / nB, V / nV); step (b, g) covers detections b*nB .. b*nB+nB-1
    and views g*nV .. g*nV+nV-1:
        tar tile   (nB, P, C)      <- tar_feat[b tile]          [VMEM]
        src tiles  nB x (nV, P, C) <- store_feats[labels[i], g] [VMEM, one
                                      block per detection so mixed-label
                                      batches stay correct; scalar-prefetched
                                      labels drive the index maps]
        per det:   sim (nV*P, P) = src_tile @ tar_i^T           [MXU, one call]
        per view:  masking / threshold / bidirectional argmax / cycle
                   consistency / per-template averaged score    [VPU + MXU]

so the P x P similarities never touch HBM and the template store is never
copied per batch. Outputs are the per-template scores + matched indices the
top-k / RANSAC stages consume (tiny: O(B x V x P)).

v3 layout (this file): the similarity tile is sim[s, t] — template patch s
in sublanes, query patch t in lanes — so every per-query-patch output is a
(1, P) row. That turns the r2 kernel's ~18 per-view VPU passes into 8:

  - the reference's src/tar mask *gathers* are gone: with sim_threshold > 0
    and masks >= 0, score_t2s[t] >= thr already implies the matched template
    patch and the query patch are inside their masks (the mask product
    multiplies the similarity), so `mask_t2s` and `tar_m > 0` are provably
    redundant — asserted in the wrapper;
  - cycle-consistency gathers (idx_s2t / score_s2t at idx_t2s[t]) are MXU
    matmuls against the one-hot argmax matrix instead of one-hot
    broadcast-multiply + reduce VPU passes;
  - the reference's elementwise `idx_s2t != 0` guard (read at query-patch
    position t, ops/matching.py:124-126 replicating matching.py:263-268)
    needs a (P,1) -> (1,P) transpose, done as a matmul against the identity;
  - `dets_per_step` (nB) tiles detections per grid step, amortizing
    per-step overhead so large batches scale instead of regressing
    (the r2 kernel's B=32 penalty).

Mosaic (TPU) lowering rules shape this kernel (validated on a real v5e chip):
  - the last two dims of every block must be (8k, 128k) or the full array
    dims -> masks ride in as (.., P, 1)/(.., 1, P), small outputs as (.., 1, 1);
  - no scalar or 1-D vector stores/reductions -> every intermediate stays 2-D
    (column (P, 1) / row (1, P)), reductions use keepdims;
  - argmax is expressed as an equality-mask + first-index min-reduction;
  - tpu.iota is integer-only.

Semantics match ops/matching.match_templates (which remains the reference
implementation and the fallback on CPU) bit-for-bit in f32 — the mask
product happens in the same order (sim * src_m * tar_m) before thresholding;
tests compare the two paths. Feature contract: both inputs L2-normalized
(AENet output and the template store are), in any float dtype —
accumulation is f32 on the MXU.
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
    *refs,
    sim_threshold: float,
    patch_threshold: int,
    num_patches: int,
    views_per_step: int,
    dets_per_step: int,
):
    nV, nB = views_per_step, dets_per_step
    tar_ref = refs[0]  # (nB, P, C)
    tar_mask_ref = refs[1]  # (nB, 1, P)
    src_refs = refs[2:2 + nB]  # each (1, nV, P, C)
    smask_refs = refs[2 + nB:2 + 2 * nB]  # each (1, nV, P, 1)
    score_ref, idx_ref, spts_ref, valid_ref = refs[2 + 2 * nB:]
    P = tar_ref.shape[1]
    C = tar_ref.shape[2]
    f32 = jnp.float32

    # per-step constants, shared by all nB*nV view stages.
    # Mosaic's tpu.iota is integer-only; cast for the f32 min-reductions.
    srow = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0).astype(f32)
    tcol = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1).astype(f32)
    eye = (srow == tcol).astype(f32)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1).astype(f32)
    np_f = float(num_patches)
    t_x = jnp.mod(t_ids, np_f)
    t_y = jnp.floor(t_ids / np_f)

    # contract the feature axis: out[s, t] = <src[s], tar[t]>
    dot_c = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    # contract the template-patch axis: (P, 1) x (P, P) -> (1, P) row
    dot_s = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )

    for ib in range(nB):  # static unroll
        tar = tar_ref[ib]  # (P, C)
        tar_m = tar_mask_ref[ib].astype(f32)  # (1, P) row
        src_all = src_refs[ib][0].reshape(nV * P, C)
        sim_all = dot_c(src_all, tar)  # (nV*P_s, P_t), one MXU call

        for v in range(nV):  # static unroll: VPU stage per view
            src_m = smask_refs[ib][0, v].astype(f32)  # (P, 1) column
            # same multiply order as the XLA path (sim * src_m * tar_m)
            # so f32 rounding is bit-identical
            sim = sim_all[v * P:(v + 1) * P, :] * src_m * tar_m
            simz = jnp.where(sim < sim_threshold, 0.0, sim)

            # first-occurrence argmax along each axis (== jnp.argmax ties)
            score_t2s = jnp.max(simz, axis=0, keepdims=True)  # (1, P)
            idx_t2s = jnp.min(
                jnp.where(simz == score_t2s, srow, float(P)),
                axis=0, keepdims=True,
            )  # (1, P) f32
            score_s2t = jnp.max(simz, axis=1, keepdims=True)  # (P, 1)
            idx_s2t = jnp.min(
                jnp.where(simz == score_s2t, tcol, float(P)),
                axis=1, keepdims=True,
            )  # (P, 1) f32

            mask_sim = score_t2s >= sim_threshold  # (1, P)

            # onehotT[s, t] = (s == idx_t2s[t]); gathers at idx_t2s become
            # skinny MXU matmuls contracting s, and the (P,1)->(1,P)
            # transpose for the idx_s2t guard is a matmul against eye
            onehotT = (srow == idx_t2s).astype(f32)  # (P, P)
            idx_s2t_row = dot_s(idx_s2t, eye)  # (1, P): idx_s2t at s=t
            if patch_threshold > 0:
                idx_cycle = dot_s(idx_s2t, onehotT)  # (1, P)
                sim_cycle = dot_s(score_s2t, onehotT)  # (1, P)
                dx = jnp.mod(idx_cycle, np_f) - t_x
                dy = jnp.floor(idx_cycle / np_f) - t_y
                dist = jnp.sqrt(dx * dx + dy * dy)
                mask_cycle = (dist <= patch_threshold) & (
                    sim_cycle >= sim_threshold
                )
            else:
                mask_cycle = jnp.ones_like(mask_sim)

            # mask-membership guards (tar_m > 0, src_m at idx_t2s > 0) are
            # implied by mask_sim when sim_threshold > 0 (see module doc);
            # only the reference's idx != 0 quirks remain
            mask_all = (
                mask_sim & mask_cycle & (idx_s2t_row != 0) & (idx_t2s != 0)
            )  # (1, P)

            mask_f = mask_all.astype(f32)
            total = jnp.sum(score_t2s * mask_f, axis=1, keepdims=True)
            count = jnp.sum(mask_f, axis=1, keepdims=True)
            score_ref[ib, v] = jnp.where(
                count > 0, total / (num_patches ** 2), 0.0
            )
            idx_ref[ib, v] = idx_t2s.astype(jnp.int32)
            spts_ref[ib, v] = score_t2s
            valid_ref[ib, v] = mask_all.astype(jnp.int32)


def _divisors_desc(n: int, cap: int):
    return [d for d in range(min(n, cap), 0, -1) if n % d == 0]


def _pick_tiles(V: int, P: int, C: int, B: int, itemsize: int) -> Tuple[int, int]:
    """(dets_per_step, views_per_step): the v5e sweep (ROUND_NOTES r3) showed
    nB=1 with the largest nV fitting a ~4 MB VMEM src budget is fastest at
    every batch (2.95 ms B=16 / 5.22 ms B=32 at ViT-L shapes); detection
    tiling (nB>1) buys nothing once the VPU passes are amortized per view and
    risks the Mosaic VMEM limit, so it stays opt-in via dets_per_step."""
    budget = 4 * 1024 * 1024
    for nv in _divisors_desc(V, 9):
        if nv * P * C * itemsize <= budget:
            return (1, nv)
    return (1, 1)


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
    dets_per_step: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-(detection, template-view) matching. Returns
    (sim_avg (B, V), idx_t2s (B, V, P), score_t2s (B, V, P), valid (B, V, P))."""
    B, P, C = tar_feat.shape
    O, V = store_feats.shape[:2]
    if sim_threshold <= 0:
        raise ValueError(
            "pallas matching requires sim_threshold > 0 (the kernel elides "
            "the mask-membership gathers, which is only exact above 0)"
        )
    if jax.default_backend() != "tpu":
        interpret = True  # Mosaic kernels only compile for TPU
    auto_nB, auto_nV = _pick_tiles(V, P, C, B, store_feats.dtype.itemsize)
    nV = views_per_step or auto_nV
    nB = dets_per_step or auto_nB
    if V % nV != 0:
        raise ValueError(f"views_per_step={nV} must divide V={V}")
    if B % nB != 0:
        raise ValueError(f"dets_per_step={nB} must divide B={B}")
    kernel = functools.partial(
        _match_kernel,
        sim_threshold=sim_threshold,
        patch_threshold=patch_threshold,
        num_patches=num_patches,
        views_per_step=nV,
        dets_per_step=nB,
    )
    G = V // nV
    Bt = B // nB
    # one src (+mask) block per detection in the tile, each indexed by its
    # own label, so mixed-label batches stay correct; when consecutive
    # detections share a label Mosaic elides the repeated DMA
    src_specs = [
        pl.BlockSpec(
            (1, nV, P, C),
            functools.partial(
                lambda i, b, g, L: (L[b * nB + i], g, 0, 0), i
            ),
        )
        for i in range(nB)
    ]
    smask_specs = [
        pl.BlockSpec(
            (1, nV, P, 1),
            functools.partial(
                lambda i, b, g, L: (L[b * nB + i], g, 0, 0), i
            ),
        )
        for i in range(nB)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bt, G),
        in_specs=[
            pl.BlockSpec((nB, P, C), lambda b, g, L: (b, 0, 0)),
            pl.BlockSpec((nB, 1, P), lambda b, g, L: (b, 0, 0)),
            *src_specs,
            *smask_specs,
        ],
        out_specs=[
            pl.BlockSpec((nB, nV, 1, 1), lambda b, g, L: (b, g, 0, 0)),
            pl.BlockSpec((nB, nV, 1, P), lambda b, g, L: (b, g, 0, 0)),
            pl.BlockSpec((nB, nV, 1, P), lambda b, g, L: (b, g, 0, 0)),
            pl.BlockSpec((nB, nV, 1, P), lambda b, g, L: (b, g, 0, 0)),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((B, V, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, V, 1, P), jnp.int32),
        jax.ShapeDtypeStruct((B, V, 1, P), jnp.float32),
        jax.ShapeDtypeStruct((B, V, 1, P), jnp.int32),
    ]
    smask4 = store_masks[:, :, :, None]
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
        tar_mask[:, None, :],
        *([store_feats] * nB),
        *([smask4] * nB),
    )
    return (
        score4[:, :, 0, 0],
        idx4[:, :, 0, :],
        spts4[:, :, 0, :],
        valid4[:, :, 0, :],
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
    dets_per_step: int | None = None,
):
    """Drop-in for ops.matching.match_templates but reading the store
    directly (no per-batch gather). Returns the same MatchResult."""
    from gigapose_tpu.ops.gather import patch_index_to_location
    from gigapose_tpu.ops.matching import MatchResult

    B, P, _ = tar_feat.shape
    sim_avg, idx_t2s, score_t2s, valid = pallas_match_scores(
        tar_feat, store_feats, tar_mask, store_masks, labels,
        sim_threshold, patch_threshold, num_patches, interpret=interpret,
        views_per_step=views_per_step, dets_per_step=dets_per_step,
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
