"""View-sharded template store: serving that scales template memory AND
matching compute over the mesh.

Why this exists: the replicated-store serving path (pipeline/estimator) puts
every object's full (V=162, P, C) AE/IST feature block on every chip. That is
the right call for a handful of objects, but BOP'24-style on-the-fly
onboarding (reference: set_template_data, src/models/gigaPose.py:357-398,
re-run per CAD model) grows the store linearly with the object count —
ViT-L features cost ~106 MB/object (85 AE + 21 IST bf16), so ~100 objects
outgrow a 16 GB v5e chip. The reference never solves this (single-GPU store,
CUDA OOM is the user's problem); the TPU-native answer is to shard the
template VIEW axis across a mesh axis ("tv") so per-chip store bytes and the
matching einsum FLOPs both drop by the shard count, while the pose-recovery
metadata (Ms/poses/K — a few KB/object) stays replicated.

Design (shard_map over a (dp, tv) mesh; nothing hand-scheduled outside the
two small collectives that ARE the algorithm):

1. every device matches the query patches against ITS V/S local views with
   the stock `ops.matching.match_templates` (same masking/cycle-consistency
   semantics, local top-k);
2. the per-shard top-k candidates — (B, k) scores/ids plus their (B, k, P, ·)
   correspondence arrays — are `all_gather`ed over "tv" (small: the (B, N,
   P, P) similarity never crosses chips);
3. the global top-k is merged EXACTLY as `lax.top_k` over the unsharded score
   row would order it (descending score, ties -> lowest view id): per-shard
   lists are already (score desc, id asc)-ordered and concatenation over
   shards is id-ascending, so a stable argsort on -score preserves the
   id-ascending tie order. Any view outside its shard's top-k is dominated by
   >= k same-shard candidates, so the merge is lossless.
4. the k winning views' IST features are fetched by ownership-masked gather +
   `psum` over "tv": the one shard owning view id v contributes its
   (P, C2) block, everyone else contributes zeros.

Steps 2b-4 of the pipeline (IST regression, RANSAC, recovery) then run via
the shared `pipeline.estimator.finish_coarse` tail under plain GSPMD (batch
on "dp").

Padding: V is zero-padded up to a multiple of the shard count with
all-masked views (mask 0 -> similarity 0 -> score 0 -> unpickable unless an
object has fewer than k scoring views at all, in which case hypotheses are
garbage in both paths anyway — same failure semantics as the reference's
zero-similarity templates).

Exactness is tested against the replicated-store `coarse_forward` on the
8-virtual-device CPU mesh, including a duplicated-view tie (tests/
test_sharded_store.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gigapose_tpu.ops.matching import MatchResult, match_templates
from gigapose_tpu.pipeline.estimator import (
    CoarsePrediction,
    DetectionBatch,
    EstimatorConfig,
    finish_coarse,
)
from gigapose_tpu.pipeline.templates import TemplateStore


def make_dp_tv_mesh(dp: int, tv: int, devices=None) -> Mesh:
    """2-D (dp, tv) mesh: batch on "dp", template views on "tv". "tv" is the
    fast (innermost) axis so the candidate all_gather and the IST psum ride
    neighboring-chip ICI links."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    assert devs.size >= dp * tv, f"need {dp * tv} devices, have {devs.size}"
    return Mesh(devs[: dp * tv].reshape(dp, tv), ("dp", "tv"))


def shard_template_store(
    store: TemplateStore, mesh: Mesh, view_axis: str = "tv"
) -> TemplateStore:
    """Place a store on the mesh with the heavy feature arrays sharded over
    the view axis (zero-padding V to a multiple of the shard count) and the
    small pose-recovery arrays (Ms/poses/K) replicated at their REAL V.

    The returned store's `num_views` is the padded V; `Ms/poses` keep the
    real V — downstream only ever indexes them with retrieved view ids, which
    are < real V whenever the object has >= k scoring views (see module
    docstring on padding semantics)."""
    S = mesh.shape[view_axis]
    V = store.num_views
    Vp = ((V + S - 1) // S) * S
    pad = Vp - V

    def pad_views(a):
        if pad == 0:
            return a
        widths = [(0, 0)] * a.ndim
        widths[1] = (0, pad)
        # numpy-backed stores (onboard_templates(to_host=True)) pad on host:
        # device_put below then streams each chip's shard straight from the
        # host buffer, so the full store never resides on any single chip
        return (
            np.pad(a, widths) if isinstance(a, np.ndarray) else jnp.pad(a, widths)
        )

    vsharded = NamedSharding(mesh, P(None, view_axis))
    repl = NamedSharding(mesh, P())
    return TemplateStore(
        ae_features=jax.device_put(pad_views(store.ae_features), vsharded),
        ist_features=jax.device_put(pad_views(store.ist_features), vsharded),
        masks=jax.device_put(pad_views(store.masks), vsharded),
        Ms=jax.device_put(store.Ms, repl),
        poses=jax.device_put(store.poses, repl),
        K=jax.device_put(store.K, repl),
    )


def _local_match_gather(
    tar_ae,
    tar_masks,
    labels,
    ae_shard,  # (O, V/S, P, C) this shard's views
    mask_shard,  # (O, V/S, P)
    ist_shard,  # (O, V/S, P, C2)
    *,
    k: int,
    sim_threshold: float,
    patch_threshold: int,
    num_patches: int,
    view_axis: str,
    use_pallas: bool,
):
    """Per-device body under shard_map (see module docstring steps 1-4)."""
    Vloc = ae_shard.shape[1]
    shard = jax.lax.axis_index(view_axis)

    # 1. local matching — stock semantics on this shard's views; the fused
    # Pallas kernel (ops/pallas_matching, the 10x TPU path) composes per
    # shard since its contract is exactly this (store, labels) matching
    if use_pallas:
        from gigapose_tpu.ops.pallas_matching import pallas_match_templates

        match = pallas_match_templates(
            tar_ae,
            ae_shard,
            tar_masks,
            mask_shard,
            labels,
            k=k,
            sim_threshold=sim_threshold,
            patch_threshold=patch_threshold,
            num_patches=num_patches,
        )
    else:
        match = match_templates(
            tar_ae,
            ae_shard[labels],
            tar_masks,
            mask_shard[labels],
            k=k,
            sim_threshold=sim_threshold,
            patch_threshold=patch_threshold,
            num_patches=num_patches,
        )
    gids = match.ids + shard * Vloc  # local -> global view ids

    # 2. gather the S*k candidates (concat over shards along the k axis)
    ag = lambda a: jax.lax.all_gather(a, view_axis, axis=1, tiled=True)
    c_scores = ag(match.scores)  # (B, S*k)
    c_ids = ag(gids)
    c_spts = ag(match.score_pts)  # (B, S*k, P)
    c_src = ag(match.src_pts)  # (B, S*k, P, 2)
    c_tar = ag(match.tar_pts)
    c_valid = ag(match.valid)

    # 3. exact top-k merge: stable sort on -score keeps the concatenation's
    # ascending-global-id order among ties — identical to lax.top_k over the
    # full (B, V) score row
    perm = jnp.argsort(-c_scores, axis=1, stable=True)[:, :k]  # (B, k)
    take = lambda a: jnp.take_along_axis(
        a, perm.reshape(perm.shape + (1,) * (a.ndim - 2)), axis=1
    )
    merged = MatchResult(
        ids=jnp.take_along_axis(c_ids, perm, axis=1),
        scores=jnp.take_along_axis(c_scores, perm, axis=1),
        score_pts=take(c_spts),
        src_pts=take(c_src),
        tar_pts=take(c_tar),
        valid=take(c_valid),
    )

    # 4. winning views' IST features by ownership-masked gather + psum
    local = merged.ids - shard * Vloc  # (B, k)
    owned = (local >= 0) & (local < Vloc)
    lc = jnp.clip(local, 0, Vloc - 1)
    contrib = ist_shard[labels[:, None], lc]  # (B, k, P, C2)
    contrib = jnp.where(owned[..., None, None], contrib, 0)
    src_ist = jax.lax.psum(contrib, view_axis)

    return merged, src_ist


def sharded_match_and_gather(
    tar_ae: jnp.ndarray,
    tar_masks: jnp.ndarray,
    labels: jnp.ndarray,
    store: TemplateStore,
    mesh: Mesh,
    cfg: EstimatorConfig,
    view_axis: str = "tv",
    dp_axis: str = "dp",
) -> Tuple[MatchResult, jnp.ndarray]:
    """Steps 1-2 of the coarse pipeline over a view-sharded store. Returns the
    merged MatchResult (global view ids) and the gathered (B, k, P, C2) IST
    features of the winning views. Call inside jit; the store must come from
    `shard_template_store` on the same mesh."""
    S = mesh.shape[view_axis]
    Vp = store.num_views
    assert Vp % S == 0, f"padded V={Vp} not divisible by {S} shards"
    assert Vp // S >= cfg.k, (
        f"per-shard views {Vp // S} < k={cfg.k}: the lossless merge needs "
        f"each shard to surface k candidates — use fewer shards"
    )
    has_dp = dp_axis in mesh.axis_names and mesh.shape[dp_axis] > 1
    bspec = P(dp_axis) if has_dp else P()
    vspec = P(None, view_axis)

    body = functools.partial(
        _local_match_gather,
        k=cfg.k,
        sim_threshold=cfg.sim_threshold,
        patch_threshold=cfg.patch_threshold,
        num_patches=cfg.num_patches,
        view_axis=view_axis,
        use_pallas=cfg.use_pallas_matching,
    )
    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(bspec, bspec, bspec, vspec, vspec, vspec),
        out_specs=(MatchResult(*([bspec] * 6)), bspec),
        # outputs ARE tv-invariant (every shard merges the same all_gathered
        # candidate list; psum closes the ist gather) but the vma inference
        # can't prove it for all_gather-derived values — exactness is what
        # tests/test_sharded_store.py pins instead
        check_vma=False,
    )
    return f(
        tar_ae.astype(store.ae_features.dtype),
        tar_masks,
        labels.astype(jnp.int32),
        store.ae_features,
        store.masks,
        store.ist_features,
    )


def coarse_forward_sharded(
    ae_net,
    ist_net,
    ae_params,
    ist_vars,
    store: TemplateStore,
    batch: DetectionBatch,
    mesh: Mesh,
    cfg: EstimatorConfig = EstimatorConfig(),
    view_axis: str = "tv",
    dp_axis: str = "dp",
) -> CoarsePrediction:
    """The full coarse pipeline with a view-sharded template store: identical
    outputs to `pipeline.estimator.coarse_forward` (tested bitwise on ids /
    correspondences), with per-chip store memory and matching FLOPs divided
    by the "tv" shard count. The feature extractors and the finish tail run
    under plain GSPMD with the batch on "dp".

    Caveat (untestable on this single-chip box): the int8 AE's pallas_call
    under dp > 1 relies on GSPMD's pallas partitioning of the batch axis; if
    a target refuses it, wrap the AE forward in a dp shard_map the way the
    matcher is — the kernels are batch-elementwise."""
    tar_ae = ae_net.apply(ae_params, batch.crops)
    tar_ist = ist_net.apply(ist_vars, batch.crops, method=ist_net.features)
    match, src_ist = sharded_match_and_gather(
        tar_ae, batch.masks, batch.labels, store, mesh, cfg, view_axis, dp_axis
    )
    return finish_coarse(
        ist_net, ist_vars, tar_ist, match, src_ist, store, batch, cfg
    )
