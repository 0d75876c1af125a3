"""Template store + onboarding: precomputed per-object template features.

Rebuild of the reference's set_template_data (src/models/gigaPose.py:357-398)
and TemplateSet (src/dataloader/template.py:17-81): for every object, its V
(=162) rendered RGBA templates are cropped to 224 around the alpha bbox,
normalized, pushed through both networks, and cached on device:

- ae_features  (O, V, P, C_ae)   L2-normalized ViT patch features
- ist_features (O, V, P, C_ist)  IST descriptor grids
- masks        (O, V, P)         patch-level alpha masks
- Ms           (O, V, 3, 3)      crop affines
- poses        (O, V, 4, 4)      object poses of each view
- K            (O, 3, 3)         template camera intrinsics

The store is a pytree, so it shards over a device mesh (replicate or shard on
O) and feeds straight into the jitted estimator. Template RGB crops are kept
optionally (for visualization only; the reference drops them in low-memory
mode, gigaPose.py:369-371).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gigapose_tpu.ops.crop import crop_resize_pad
from gigapose_tpu.ops.matching import downsample_mask

# CLIP-style normalization (ref: configs/data/transform.yaml:2-8)
RGB_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
RGB_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

# Fixed template intrinsics (ref: src/scripts/render_bop_templates.py:70,
# src/custom_megapose/template_dataset.py:194-196); 480x640, object at 0.4 m.
TEMPLATE_K = np.array(
    [[572.4114, 0.0, 320.0], [0.0, 573.57043, 240.0], [0.0, 0.0, 1.0]], np.float32
)


def normalize_rgb(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, H, W) in [0, 1] -> CLIP-normalized."""
    mean = jnp.asarray(RGB_MEAN).reshape((3, 1, 1))
    std = jnp.asarray(RGB_STD).reshape((3, 1, 1))
    return (rgb - mean) / std


def alpha_bboxes(alphas: np.ndarray) -> np.ndarray:
    """(V, H, W) alpha channels -> (V, 4) xyxy tight boxes (PIL getbbox
    convention: exclusive max edge; ref template_dataset.py:76-82 incl. the
    zero-area full-image fallback)."""
    V, H, W = alphas.shape
    boxes = np.zeros((V, 4), np.int32)
    for v in range(V):
        ys, xs = np.nonzero(alphas[v] > 0)
        if len(ys) == 0:
            boxes[v] = (0, 0, W, H)
        else:
            boxes[v] = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
    return boxes


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TemplateStore:
    ae_features: jnp.ndarray  # (O, V, P, C_ae)
    ist_features: jnp.ndarray  # (O, V, P, C_ist)
    masks: jnp.ndarray  # (O, V, P) float {0,1}
    Ms: jnp.ndarray  # (O, V, 3, 3)
    poses: jnp.ndarray  # (O, V, 4, 4)
    K: jnp.ndarray  # (O, 3, 3)

    @property
    def num_objects(self) -> int:
        return self.ae_features.shape[0]

    @property
    def num_views(self) -> int:
        return self.ae_features.shape[1]


from functools import lru_cache, partial


def _onboard_prep_body(rgbas, boxes, target_size: int, num_patches: int):
    if rgbas.dtype == jnp.uint8:
        # uint8 templates transfer host->HBM at 1/4 the bytes (the relay is
        # an onboarding bottleneck); convert on device
        rgbas = rgbas.astype(jnp.float32) / 255.0
    crops, Ms = crop_resize_pad(rgbas, boxes, target_size)
    rgb = normalize_rgb(crops[:, :3])
    mask_img = crops[:, 3]
    masks = downsample_mask(mask_img, num_patches)
    return rgb, mask_img, masks, Ms


_onboard_prep = partial(jax.jit, static_argnames=("target_size", "num_patches"))(
    _onboard_prep_body
)


@lru_cache(maxsize=16)
def _wrap_paramless(apply):
    """Adapt a bare `apply(x)` closure to the (params, x) calling convention
    (params ignored). Cached so repeated onboarding calls with the same
    closure reuse one wrapper object and hit _onboard_fn's compile cache."""

    def fn(params, x):
        del params
        return apply(x)

    return fn


def _apply_pair(apply):
    """Normalize an extractor spec to (pure_fn(params, x), params).

    Callers may pass either a `(pure_fn, params)` tuple — weights enter the
    onboarding program as RUNTIME ARGUMENTS — or a bare `apply(x)` closure
    (legacy), whose captured weights become jaxpr constants embedded in the
    compiled module. The closure form is fine for small nets but a ViT-L
    int8 closure inlines ~300 MB of weights into the compile payload, which
    a remote-compile relay rejects (HTTP 413, measured r5); prefer
    estimator.ae_apply_pair / ist_apply_pair."""
    if isinstance(apply, tuple):
        return apply
    return _wrap_paramless(apply), None


@lru_cache(maxsize=16)
def _onboard_fn(ae_apply, ist_apply, target_size: int, num_patches: int,
                chunk: int, V: int, feature_dtype):
    """One jitted program for a whole object's onboarding: prep + chunked
    AE/IST forwards (lax.map bounds activation memory like the reference's
    forward_by_chunk) + feature cast. A single dispatch per object — on a
    remote (axon) backend every eager op/dispatch costs a round trip, which
    dominated the first measured onboarding throughput (ROUND_NOTES r2).
    ae_apply/ist_apply take (params, x); params ride as run() arguments so
    large checkpoints never bloat the compile payload."""
    n_chunks = -(-V // chunk)
    Vp = n_chunks * chunk

    @jax.jit
    def run(ae_params, ist_params, rgbas, boxes):
        rgb, mask_img, masks, Ms = _onboard_prep_body(
            rgbas, boxes, target_size, num_patches
        )
        rgbp = jnp.pad(rgb, ((0, Vp - V), (0, 0), (0, 0), (0, 0)))
        chunks = rgbp.reshape(n_chunks, chunk, *rgb.shape[1:])
        ae = jax.lax.map(lambda c: ae_apply(ae_params, c), chunks)
        ist = jax.lax.map(lambda c: ist_apply(ist_params, c), chunks)
        ae = ae.reshape(Vp, *ae.shape[2:])[:V].astype(feature_dtype)
        ist = ist.reshape(Vp, *ist.shape[2:])[:V].astype(feature_dtype)
        return rgb, mask_img, masks, Ms, ae, ist

    return run


def prepare_template_crops(
    rgbas: np.ndarray, target_size: int = 224, num_patches: int = 16
) -> jnp.ndarray:
    """(V, 4, H, W) RGBA templates -> (V, 3, S, S) CLIP-normalized crops —
    exactly what the onboarding extractors consume. Public so callers that
    need a small sample of the serving crop distribution (e.g. static int8
    activation-scale calibration, CoarseRunner._maybe_calibrate_ist) get
    bit-identical preprocessing to the store's own features."""
    rgbas = np.asarray(rgbas)
    boxes = alpha_bboxes(rgbas[:, 3])
    rgb, _, _, _ = _onboard_prep(
        jnp.asarray(rgbas), jnp.asarray(boxes), target_size, num_patches
    )
    return rgb


def stage_object(rgbas: np.ndarray):
    """Start the async host->HBM upload of one object's templates and compute
    the alpha bboxes host-side. jax.device_put returns immediately, so calling
    this for object i+1 before running object i's (jitted) onboarding overlaps
    the upload with compute — the double-buffered staging SURVEY §7 stage 2
    calls for (the reference's counterpart is the preprocessed-template disk
    cache + loader prefetch, template_dataset.py:85-120)."""
    rgbas = np.asarray(rgbas)  # (V, 4, H, W) float [0,1] or uint8
    boxes = alpha_bboxes(rgbas[:, 3])
    return jax.device_put(rgbas), jax.device_put(boxes)


def onboard_object(
    ae_apply: Callable,
    ist_apply: Callable,
    rgbas: np.ndarray,
    poses: np.ndarray,
    K: Optional[np.ndarray] = None,
    target_size: int = 224,
    num_patches: int = 16,
    chunk: int = 64,
    feature_dtype=jnp.float32,
    staged=None,  # optional (device_rgbas, device_boxes) from stage_object
):
    """Onboard one object: (V, 4, H, W) RGBA templates in [0,1] -> per-view
    features/masks/Ms. `chunk` bounds peak activation memory like the
    reference's forward_by_chunk (max_batch_size=64)."""
    V = np.asarray(rgbas).shape[0] if staged is None else staged[0].shape[0]
    dev_rgbas, dev_boxes = staged if staged is not None else stage_object(rgbas)
    ae_fn, ae_params = _apply_pair(ae_apply)
    ist_fn, ist_params = _apply_pair(ist_apply)
    run = _onboard_fn(
        ae_fn, ist_fn, target_size, num_patches, min(chunk, V), V,
        np.dtype(feature_dtype),
    )
    rgb, mask_img, masks, Ms, ae_f, ist_f = run(
        ae_params, ist_params, dev_rgbas, dev_boxes
    )
    return dict(
        ae_features=ae_f,
        ist_features=ist_f,
        masks=masks.astype(jnp.float32),
        Ms=Ms,
        poses=jnp.asarray(poses, jnp.float32),
        K=jnp.asarray(TEMPLATE_K if K is None else K, jnp.float32),
        rgb=rgb,
        mask_img=mask_img,
    )


def onboard_templates(
    ae_apply: Callable,
    ist_apply: Callable,
    rgbas_per_object,  # iterable of (V, 4, H, W) arrays
    poses_per_object,  # iterable of (V, 4, 4) arrays
    Ks_per_object=None,
    overlap_uploads: Optional[bool] = None,
    to_host: bool = False,
    **kwargs,
) -> TemplateStore:
    """Onboard a dataset's objects into a stacked TemplateStore.

    overlap_uploads double-buffers host->HBM staging: object i+1's transfer
    is started (async device_put) before object i's fused onboarding program
    runs, so per-object wall time approaches max(upload, compute) instead of
    their sum on hosts whose DMA engines run transfers concurrently with
    compute. Default is auto: ON for a local TPU host, OFF on the axon
    relay, which serializes transfers with compute — measured A/B on v5e
    through the relay: inline 1.148 s/object vs staged 1.328 (ROUND_NOTES
    r3), so early staging only adds queueing there.

    to_host=True streams each object's features to host RAM as it completes,
    returning a numpy-backed store: peak device memory stays at ONE object
    regardless of the object count. This is how a store destined for view
    sharding (parallel/sharded_store) must be built — stacking on device
    first would OOM exactly the stores sharding exists for; device_put then
    streams each chip's shard straight from the host buffer."""
    if overlap_uploads is None:
        import os as _os

        overlap_uploads = not bool(_os.environ.get("PALLAS_AXON_POOL_IPS"))
    pairs = list(zip(rgbas_per_object, poses_per_object))
    entries = []
    staged = stage_object(pairs[0][0]) if (pairs and overlap_uploads) else None
    for i, (rgbas, poses) in enumerate(pairs):
        current = staged
        if overlap_uploads and i + 1 < len(pairs):
            staged = stage_object(pairs[i + 1][0])  # upload overlaps compute
        K = None if Ks_per_object is None else Ks_per_object[i]
        entry = onboard_object(ae_apply, ist_apply, rgbas, poses, K,
                               staged=current, **kwargs)
        if to_host:
            # stream to host + drop the crop byproducts: device buffers free
            # as we go, so peak device residency is ONE object's onboarding
            entry = {
                k: np.asarray(entry[k])
                for k in ("ae_features", "ist_features", "masks", "Ms",
                          "poses", "K")
            }
        entries.append(entry)
    xp = np if to_host else jnp
    stack = lambda name: xp.stack([e[name] for e in entries])
    return TemplateStore(
        ae_features=stack("ae_features"),
        ist_features=stack("ist_features"),
        masks=stack("masks"),
        Ms=stack("Ms"),
        poses=stack("poses"),
        K=stack("K"),
    )


@lru_cache(maxsize=16)
def _onboard_fn_sharded(ae_apply, ist_apply, mesh, target_size: int,
                        num_patches: int, chunk: int, V: int, feature_dtype):
    """Object-parallel fused onboarding: the per-object program vmapped over
    a leading object axis that is sharded on the mesh's "dp" axis — each
    chip onboards its objects, the store is all-gathered (replicated) on the
    way out, ready for data-parallel eval. This is the multi-chip equivalent
    of the reference's num_gpus round-robin template rendering
    (src/scripts/render_bop_templates.py:63)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_chunks = -(-V // chunk)
    Vp = n_chunks * chunk

    def one(ae_params, ist_params, rgbas, boxes):
        rgb, mask_img, masks, Ms = _onboard_prep_body(
            rgbas, boxes, target_size, num_patches
        )
        rgbp = jnp.pad(rgb, ((0, Vp - V), (0, 0), (0, 0), (0, 0)))
        chunks = rgbp.reshape(n_chunks, chunk, *rgb.shape[1:])
        ae = jax.lax.map(lambda c: ae_apply(ae_params, c), chunks)
        ist = jax.lax.map(lambda c: ist_apply(ist_params, c), chunks)
        ae = ae.reshape(Vp, *ae.shape[2:])[:V].astype(feature_dtype)
        ist = ist.reshape(Vp, *ist.shape[2:])[:V].astype(feature_dtype)
        return rgb, mask_img, masks, Ms, ae, ist

    dp = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        jax.vmap(one, in_axes=(None, None, 0, 0)),
        in_shardings=(repl, repl, dp, dp),  # params replicated, objects dp
        out_shardings=repl,
    )


def onboard_templates_sharded(
    ae_apply: Callable,
    ist_apply: Callable,
    rgbas_per_object,  # (O, V, 4, H, W) array or list of same-shape arrays
    poses_per_object,  # (O, V, 4, 4)
    mesh,  # jax.sharding.Mesh with a "dp" axis
    Ks_per_object=None,
    target_size: int = 224,
    num_patches: int = 16,
    chunk: int = 64,
    feature_dtype=jnp.float32,
) -> TemplateStore:
    """Onboard objects in parallel across the mesh's "dp" devices.

    Objects are padded to a multiple of the dp size (padding objects are
    dropped from the returned store). All objects must share the template
    count and image size — true for every template set (V views, fixed
    render size)."""
    rgbas = np.stack([np.asarray(r) for r in rgbas_per_object])
    poses = np.stack([np.asarray(p) for p in poses_per_object])
    O, V = rgbas.shape[:2]
    n = mesh.shape["dp"]
    Op = -(-O // n) * n
    if Op != O:
        pad = np.zeros((Op - O,) + rgbas.shape[1:], rgbas.dtype)
        # padding objects keep a nonzero alpha pixel so alpha_bboxes stays
        # well-defined; their rows are discarded below
        pad[:, :, 3, 0, 0] = 1 if rgbas.dtype == np.uint8 else 1.0
        rgbas = np.concatenate([rgbas, pad])
    boxes = np.stack([alpha_bboxes(r[:, 3]) for r in rgbas])
    ae_fn, ae_params = _apply_pair(ae_apply)
    ist_fn, ist_params = _apply_pair(ist_apply)
    run = _onboard_fn_sharded(
        ae_fn, ist_fn, mesh, target_size, num_patches,
        min(chunk, V), V, np.dtype(feature_dtype),
    )
    _, _, masks, Ms, ae_f, ist_f = run(
        ae_params, ist_params, jnp.asarray(rgbas), jnp.asarray(boxes)
    )
    K = (
        np.stack([np.asarray(k) for k in Ks_per_object])
        if Ks_per_object is not None
        else np.tile(np.asarray(TEMPLATE_K, np.float32), (O, 1, 1))
    )
    return TemplateStore(
        ae_features=ae_f[:O],
        ist_features=ist_f[:O],
        masks=masks[:O].astype(jnp.float32),
        Ms=Ms[:O],
        poses=jnp.asarray(poses, jnp.float32),
        K=jnp.asarray(K, jnp.float32),
    )
