"""End-to-end coarse pose estimation — the north-star inference path.

Rebuild of the reference's eval_retrieval (src/models/gigaPose.py:481-609):
features -> template retrieval -> per-correspondence scale/in-plane regression
-> one-correspondence RANSAC -> closed-form 6D recovery, as ONE jitted,
fixed-shape function. The reference's Python loops (detection chunking,
per-k IST loop gigaPose.py:545, per-detection RANSAC loop ransac.py:134) are
vmaps; its host round-trips disappear.

Batch contract (fixed shapes, pad + mask):
    crops  (B, 3, 224, 224) CLIP-normalized detection crops
    masks  (B, P)           patch-level modal masks
    labels (B,)             0-based object index into the TemplateStore
    Ks     (B, 3, 3)        query intrinsics
    Ms     (B, 3, 3)        query crop affines
    valid  (B,)             padding mask

Data-parallel scaling: `make_sharded_apply` shards the batch axis over a
1-D device mesh; the template store is replicated (or sharded over objects
for very large stores). Collectives ride ICI via jax.sharding — nothing to
hand-write.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gigapose_tpu.models.ae_net import AENet
from gigapose_tpu.models.ist_net import ISTNet, default_ist_net
from gigapose_tpu.ops.matching import match_templates
from gigapose_tpu.ops.ransac import ransac_affine
from gigapose_tpu.ops.pose_recovery import recover_poses
from gigapose_tpu.pipeline.templates import TemplateStore


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DetectionBatch:
    crops: jnp.ndarray  # (B, 3, 224, 224)
    masks: jnp.ndarray  # (B, P)
    labels: jnp.ndarray  # (B,) int32
    Ks: jnp.ndarray  # (B, 3, 3)
    Ms: jnp.ndarray  # (B, 3, 3)
    valid: jnp.ndarray  # (B,) bool


class CoarsePrediction(NamedTuple):
    poses: jnp.ndarray  # (B, k, 4, 4) — sorted by score desc
    scores: jnp.ndarray  # (B, k) RANSAC inlier score / P
    view_ids: jnp.ndarray  # (B, k) retrieved template view ids
    M: jnp.ndarray  # (B, k, 3, 3) RANSAC affines
    failed: jnp.ndarray  # (B, k) bool
    sim_scores: jnp.ndarray  # (B, k) template similarity scores
    ransac_valid: jnp.ndarray  # (B, k, P) inlier masks
    src_pts: jnp.ndarray  # (B, k, P, 2)
    tar_pts: jnp.ndarray  # (B, k, P, 2)


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    k: int = 5
    sim_threshold: float = 0.5
    patch_threshold: int = 3
    pixel_threshold: float = 14.0
    patch_size: int = 14
    num_patches: int = 16
    sort_by_inliers: bool = True  # ref: gigaPose.py:586-594
    # fused Pallas matching kernel (TPU): template store stays HBM-resident,
    # the (P, P) similarity never leaves VMEM (ops/pallas_matching.py)
    use_pallas_matching: bool = False


def coarse_forward(
    ae_net: AENet,
    ist_net: ISTNet,
    ae_params,
    ist_vars,
    store: TemplateStore,
    batch: DetectionBatch,
    cfg: EstimatorConfig = EstimatorConfig(),
) -> CoarsePrediction:
    """The full jitted coarse pipeline. All shapes static."""
    P = cfg.num_patches**2
    labels = batch.labels.astype(jnp.int32)

    # ---- features of the query crops (the ViT hot loop)
    tar_ae = ae_net.apply(ae_params, batch.crops)  # (B, P, C)
    tar_ist = ist_net.apply(ist_vars, batch.crops, method=ist_net.features)
    assert tar_ae.shape[1] == P and tar_ist.shape[1] == P, (
        f"feature grids must match the {cfg.num_patches}x{cfg.num_patches} patch "
        f"convention; got AE P={tar_ae.shape[1]}, IST P={tar_ist.shape[1]} "
        "(check the IST backbone input_size: stride is /16, so 16*num_patches)"
    )

    # ---- step 1: retrieval + correspondences (ref: matching.py:188-316)
    if cfg.use_pallas_matching:
        from gigapose_tpu.ops.pallas_matching import pallas_match_templates

        match = pallas_match_templates(
            tar_ae.astype(store.ae_features.dtype),
            store.ae_features,
            batch.masks,
            store.masks,
            labels,
            k=cfg.k,
            sim_threshold=cfg.sim_threshold,
            patch_threshold=cfg.patch_threshold,
            num_patches=cfg.num_patches,
        )
    else:
        src_ae = store.ae_features[labels]  # (B, V, P, C)
        src_masks = store.masks[labels]  # (B, V, P)
        match = match_templates(
            tar_ae.astype(src_ae.dtype),
            src_ae,
            batch.masks,
            src_masks,
            k=cfg.k,
            sim_threshold=cfg.sim_threshold,
            patch_threshold=cfg.patch_threshold,
            num_patches=cfg.num_patches,
        )

    # ---- step 2: per-correspondence scale/in-plane (ref: gigaPose.py:538-575)
    # single flat gather of only the k retrieved views — never materializes
    # the (B, V, P, C2) per-batch copy of the store
    V = store.ist_features.shape[1]
    flat_ist = store.ist_features.reshape((-1,) + store.ist_features.shape[2:])
    src_ist = flat_ist[labels[:, None] * V + match.ids]  # (B, k, P, C2)

    return finish_coarse(
        ist_net, ist_vars, tar_ist, match, src_ist, store, batch, cfg
    )


def finish_coarse(
    ist_net: ISTNet,
    ist_vars,
    tar_ist: jnp.ndarray,
    match,
    src_ist: jnp.ndarray,
    store: TemplateStore,
    batch: DetectionBatch,
    cfg: EstimatorConfig,
) -> CoarsePrediction:
    """Steps 2b-4 of the coarse pipeline, shared between the replicated-store
    path (coarse_forward) and the view-sharded store path
    (parallel/sharded_store.coarse_forward_sharded): IST regression on the k
    retrieved views' correspondences, RANSAC, hypothesis sorting, and
    closed-form 6D recovery. `src_ist` is the already-gathered (B, k, P, C2)
    IST feature block of the retrieved views; `store`'s Ms/poses/K must be the
    full (unsharded) per-object arrays — they are tiny and stay replicated
    even when the feature stores shard."""
    P = cfg.num_patches**2
    labels = batch.labels.astype(jnp.int32)

    def regress_one_k(src_feat_k, src_pts_k, tar_pts_k):
        return ist_net.apply(
            ist_vars,
            src_feat_k,
            tar_ist.astype(src_feat_k.dtype),
            src_pts_k,
            tar_pts_k,
            method=ist_net.regress,
        )

    ist_out = jax.vmap(regress_one_k, in_axes=(1, 1, 1), out_axes=1)(
        src_ist, match.src_pts, match.tar_pts
    )  # fields (B, k, P[, 2])

    # ---- step 3: RANSAC over (B, k) hypotheses (ref: ransac.py, poses.py:124)
    corr_valid = match.valid & ist_out.valid
    rr = ransac_affine(
        match.src_pts,
        match.tar_pts,
        match.score_pts,
        ist_out.scale,
        ist_out.cossin,
        corr_valid,
        pixel_threshold=cfg.pixel_threshold,
        patch_size=cfg.patch_size,
    )

    # hypothesis score = summed inlier matching score / P (gigaPose.py:583-585)
    scores = jnp.sum(rr.inlier_scores, axis=-1) / P  # (B, k)

    view_ids, Ms_r, failed, sim_scores = match.ids, rr.M, rr.failed, match.scores
    inliers, src_pts, tar_pts = rr.inliers, match.src_pts, match.tar_pts
    if cfg.sort_by_inliers:
        order = jnp.argsort(-scores, axis=1)
        take = lambda a: jnp.take_along_axis(
            a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1
        )
        scores = jnp.take_along_axis(scores, order, axis=1)
        view_ids = jnp.take_along_axis(view_ids, order, axis=1)
        failed = jnp.take_along_axis(failed, order, axis=1)
        sim_scores = jnp.take_along_axis(sim_scores, order, axis=1)
        Ms_r = take(Ms_r)
        inliers = take(inliers)
        src_pts = take(src_pts)
        tar_pts = take(tar_pts)

    # ---- step 4: closed-form 6D recovery (ref: poses.py:26-101)
    poses = recover_poses(
        batch.Ms,
        batch.Ks,
        view_ids,
        Ms_r,
        store.K[labels],
        store.Ms[labels],
        store.poses[labels],
    )

    return CoarsePrediction(
        poses=poses,
        scores=scores * batch.valid[:, None],
        view_ids=view_ids,
        M=Ms_r,
        failed=failed | ~batch.valid[:, None],
        sim_scores=sim_scores,
        ransac_valid=inliers,
        src_pts=src_pts,
        tar_pts=tar_pts,
    )


@dataclasses.dataclass
class GigaPoseEstimator:
    """Holds the nets + params and exposes jitted entry points.

    The stateful reference GigaPose LightningModule (src/models/gigaPose.py:34)
    becomes this thin host-side object over pure functions.
    """

    ae_net: AENet
    ist_net: ISTNet
    ae_params: dict
    ist_vars: dict
    config: EstimatorConfig = EstimatorConfig()

    @classmethod
    def create(
        cls,
        model_name: str = "dinov2_vits14",
        seed: int = 0,
        config: EstimatorConfig = EstimatorConfig(),
        ist_descriptor_size: int = 256,
        compute_dtype: str = None,
    ) -> "GigaPoseEstimator":
        ae_net = AENet(model_name=model_name, compute_dtype=compute_dtype)
        ist_net = default_ist_net(
            descriptor_size=ist_descriptor_size, compute_dtype=compute_dtype
        )
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        dummy = jnp.zeros((1, 3, 224, 224), jnp.float32)
        dummy_pts = jnp.zeros((1, 4, 2), jnp.float32)
        ae_params = ae_net.init(k1, dummy)
        ist_vars = ist_net.init(k2, dummy, dummy, dummy_pts, dummy_pts)
        return cls(ae_net, ist_net, ae_params, ist_vars, config)

    def quantize_serving(
        self, backend: Optional[str] = None, ist=False
    ) -> "GigaPoseEstimator":
        """Swap the AE backbone for the W8A8 int8 serving path
        (models/vit_int8: fused Pallas LN+quant+matmul / attention-block /
        MLP kernels — measured 1.6-1.7x over the bf16 flax forward on v5e
        at ViT-L B=16, feature cos >= 0.99999 vs bf16; ROUND_NOTES r3).

        ist=True additionally swaps the IST ResNet backbone to int8 convs
        (models/ist_int8 — XLA's native int8 MXU conv lowering; OFF by
        default until the on-chip A/B is recorded). ist="static" further
        requests STATIC calibrated activation scales — the quant chain then
        fuses into each conv's producer (the dynamic per-image absmax was
        the measured reason int8 IST lost to bf16, models/ist_int8
        docstring); the calibration itself runs at template onboarding on
        the serving crop distribution (CoarseRunner._maybe_calibrate_ist).

        Inference-only. Call AFTER loading checkpoints and BEFORE template
        onboarding: queries and the template store must share one feature
        extractor. Set model.serving_quant=off for strict-parity eval."""
        from gigapose_tpu.models.vit_int8 import AENetInt8

        if backend is None:  # Mosaic kernels on TPU; fake-quant XLA elsewhere
            backend = "pallas" if jax.default_backend() == "tpu" else "ref"
        q = AENetInt8.from_ae_net(self.ae_net, self.ae_params, backend=backend)
        self.ae_net = q
        self.ae_params = q.params
        if ist:
            from gigapose_tpu.models.ist_int8 import ISTNetInt8

            iq = ISTNetInt8.from_ist_net(
                self.ist_net, self.ist_vars,
                backend="int8" if backend != "ref" else "ref",
                static_scales=(ist == "static"),
            )
            self.ist_net = iq
            self.ist_vars = iq.variables
        for k in ("_jitted", "ae_apply", "ist_apply",
                  "_ae_apply_fn", "_ist_apply_fn"):
            self.__dict__.pop(k, None)  # drop jit caches built on the old net
        return self

    @functools.cached_property
    def _jitted(self):
        return jax.jit(
            functools.partial(coarse_forward, self.ae_net, self.ist_net),
            static_argnames=("cfg",),
        )

    def __call__(self, store: TemplateStore, batch: DetectionBatch) -> CoarsePrediction:
        return self._jitted(self.ae_params, self.ist_vars, store, batch, cfg=self.config)

    @functools.cached_property
    def ae_apply(self):
        return jax.jit(lambda x: self.ae_net.apply(self.ae_params, x))

    @functools.cached_property
    def ist_apply(self):
        return jax.jit(
            lambda x: self.ist_net.apply(self.ist_vars, x, method=self.ist_net.features)
        )

    # (pure_fn, params) forms for onboarding: the weights enter the fused
    # onboarding program as runtime arguments instead of closure constants.
    # A ViT-L int8 closure embeds ~300 MB of weights in the compiled module,
    # which the axon relay's remote-compile endpoint rejects (HTTP 413,
    # measured r5) — and even locally would re-serialize the checkpoint into
    # every (V, chunk)-shaped onboarding variant's executable.
    @functools.cached_property
    def _ae_apply_fn(self):
        return lambda p, x: self.ae_net.apply(p, x)

    @property
    def ae_apply_pair(self):
        return self._ae_apply_fn, self.ae_params

    @functools.cached_property
    def _ist_apply_fn(self):
        return lambda p, x: self.ist_net.apply(p, x, method=self.ist_net.features)

    @property
    def ist_apply_pair(self):
        return self._ist_apply_fn, self.ist_vars
