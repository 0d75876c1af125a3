"""Train state + jitted train step.

Rebuild of the reference's training loop pieces:
- HybridOptim wrapping two AdamW groups (ae lr=1e-5, ist lr=1e-4, wd=5e-4;
  src/utils/optimizer.py:6-221, configs/model/large.yaml:27-33) becomes a
  single optax.multi_transform over a combined param tree.
- hand-rolled linear LR warm-up over 200 steps (gigaPose.py:79-94) becomes an
  optax linear_schedule per group.
- the l2-before/geodesic-after warm-up loss switch (gigaPose.py:224-236) is a
  jnp.where on the step counter, so the step stays a single compiled function.
- losses: InfoNCE over GT patch correspondences + scale/in-plane regression
  (gigaPose.py:146-260), mask-aware instead of compacting.

Data-parallel: `train_step` is pure; jit it with batch sharded over the dp
mesh axis and params replicated — XLA inserts the gradient psum (the NCCL
all-reduce of PL-DDP, SURVEY §2.8).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from gigapose_tpu.models.ae_net import AENet
from gigapose_tpu.models.ist_net import ISTNet
from gigapose_tpu.models import losses as L
from gigapose_tpu.ops.gather import gather_patches


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainBatch:
    """One training pair batch (ref collate: src/dataloader/train.py:239-279)."""

    src_img: jnp.ndarray  # (B, 3, H, W) template crop (normalized)
    tar_img: jnp.ndarray  # (B, 3, H, W) query crop (normalized)
    src_pts: jnp.ndarray  # (B, P, 2) GT correspondence patch coords, -1 invalid
    tar_pts: jnp.ndarray  # (B, P, 2)
    rel_scale: jnp.ndarray  # (B,) GT relative scale
    rel_inplane: jnp.ndarray  # (B,) GT relative in-plane angle (radians)
    # patch-level crop masks, used by the val/matching metric (optional for
    # the train step itself)
    src_mask: jnp.ndarray = None
    tar_mask: jnp.ndarray = None


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    ae_lr: float = 1e-5
    ist_lr: float = 1e-4
    weight_decay: float = 5e-4
    warm_up_steps: int = 200
    nets_to_train: str = "all"  # "ae" | "ist" | "all"
    tau: float = 0.1
    # stabilizers for small-data/short-budget training (the tiny-fixture
    # InfoNCE collapse investigated in ROUND_NOTES r2/r3; both default OFF so
    # the reference recipe is unchanged):
    grad_clip: float = 0.0  # >0 -> optax.clip_by_global_norm before AdamW
    # temperature warm-up: anneal tau from tau_start down to tau over
    # tau_warmup_steps (softer contrastive gradients while features are
    # random, preventing the early collapse mode)
    tau_start: float = 0.0  # 0 -> disabled
    tau_warmup_steps: int = 0
    # --- train-forward HBM-residue knobs (VERDICT r4 next-round #2), each
    # A/B'd on-chip before changing any default:
    # one fused 2B IST-backbone apply instead of two B-sized applies —
    # halves conv dispatches and doubles the MXU batch, but BatchNorm then
    # computes JOINT src+tar batch stats (the reference computes separate
    # per-call stats through the shared BN, ist_net.py:53-70)
    fuse_ist_pair: bool = False
    # "bf16": store the (N, N) InfoNCE logit matrix in bfloat16 (halves the
    # dominant loss-side HBM traffic; logsumexp accumulates in f32, the
    # positive logit comes from the pair rows directly, never the matrix)
    nce_dtype: str = None


class TrainState(NamedTuple):
    step: jnp.ndarray
    ae_params: Any
    ist_params: Any
    ist_batch_stats: Any
    opt_state: Any


def _warmup_then_const(lr: float, warm_up_steps: int):
    # reference: lr scales linearly as step/warm_up (gigaPose.py:79-94)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warm_up_steps), optax.constant_schedule(lr)],
        [warm_up_steps],
    )


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    tx = {
        "ae": optax.adamw(
            _warmup_then_const(cfg.ae_lr, cfg.warm_up_steps),
            weight_decay=cfg.weight_decay,
        ),
        "ist": optax.adamw(
            _warmup_then_const(cfg.ist_lr, cfg.warm_up_steps),
            weight_decay=cfg.weight_decay,
        ),
        "frozen": optax.set_to_zero(),
    }

    def label_fn(params):
        g_ae = "ae" if cfg.nets_to_train in ("ae", "all") else "frozen"
        g_ist = "ist" if cfg.nets_to_train in ("ist", "all") else "frozen"
        return {
            "ae": jax.tree_util.tree_map(lambda _: g_ae, params["ae"]),
            "ist": jax.tree_util.tree_map(lambda _: g_ist, params["ist"]),
        }

    opt = optax.multi_transform(tx, label_fn)
    if cfg.grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    return opt


def create_train_state(
    ae_net: AENet,
    ist_net: ISTNet,
    rng: jax.Array,
    cfg: OptimConfig = OptimConfig(),
    image_size: int = 224,
) -> Tuple[TrainState, optax.GradientTransformation]:
    k1, k2 = jax.random.split(rng)
    dummy = jnp.zeros((1, 3, image_size, image_size), jnp.float32)
    dummy_pts = jnp.zeros((1, 4, 2), jnp.float32)
    ae_vars = ae_net.init(k1, dummy)
    ist_vars = ist_net.init(k2, dummy, dummy, dummy_pts, dummy_pts)
    params = {"ae": ae_vars["params"], "ist": ist_vars["params"]}
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            ae_params=params["ae"],
            ist_params=params["ist"],
            ist_batch_stats=ist_vars.get("batch_stats", {}),
            opt_state=opt_state,
        ),
        tx,
    )


def compute_losses(
    ae_net: AENet,
    ist_net: ISTNet,
    params: Dict,
    batch_stats,
    batch: TrainBatch,
    step: jnp.ndarray,
    cfg: OptimConfig,
):
    """Returns (total_loss, (metrics, new_batch_stats))."""
    B, P = batch.src_pts.shape[:2]
    metrics: Dict[str, jnp.ndarray] = {}
    total = 0.0
    new_stats = batch_stats

    valid = (batch.src_pts[..., 0] >= 0) & (batch.tar_pts[..., 0] >= 0)  # (B, P)
    flat_valid = valid.reshape(-1)
    gt_cossin = jnp.stack(
        [jnp.cos(batch.rel_inplane), jnp.sin(batch.rel_inplane)], axis=-1
    )

    if cfg.nets_to_train in ("ist", "all"):
        # regression loss on per-correspondence predictions (gigaPose.py:194-260)
        if cfg.fuse_ist_pair:
            # ONE 2B backbone apply (interleaved like the AE fused forward so
            # dp shards stay aligned); BatchNorm sees joint src+tar stats —
            # a deliberate deviation from the reference's two sequential
            # BN calls, gated behind cfg.fuse_ist_pair
            stacked2 = jnp.stack([batch.src_img, batch.tar_img], axis=1)
            feats, mut = ist_net.apply(
                {"params": params["ist"], "batch_stats": batch_stats},
                stacked2.reshape((2 * B,) + stacked2.shape[2:]),
                train=True,
                mutable=["batch_stats"],
                method=ist_net.features,
            )
            feats = feats.reshape((B, 2) + feats.shape[1:])
            ist_out = ist_net.apply(
                {"params": params["ist"]},
                feats[:, 0], feats[:, 1], batch.src_pts, batch.tar_pts,
                method=ist_net.regress,
            )
        else:
            ist_out, mut = ist_net.apply(
                {"params": params["ist"], "batch_stats": batch_stats},
                batch.src_img,
                batch.tar_img,
                batch.src_pts,
                batch.tar_pts,
                train=True,
                mutable=["batch_stats"],
            )
        new_stats = mut["batch_stats"]
        v = (ist_out.valid & valid).reshape(-1)
        pred_scale = ist_out.scale.reshape(-1)
        pred_cossin = ist_out.cossin.reshape(-1, 2)
        gt_scale_pc = jnp.broadcast_to(batch.rel_scale[:, None], (B, P)).reshape(-1)
        gt_cossin_pc = jnp.broadcast_to(gt_cossin[:, None], (B, P, 2)).reshape(-1, 2)

        warm_s, warm_i = L.l2_warmup_losses(
            pred_scale, pred_cossin, gt_scale_pc, gt_cossin_pc, v
        )
        main_s = L.scale_loss(pred_scale, gt_scale_pc, v, log=True)
        main_i = L.inplane_loss(pred_cossin, gt_cossin_pc, v, loss="geodesic")
        in_warmup = step < cfg.warm_up_steps
        loss_s = jnp.where(in_warmup, warm_s, main_s)
        loss_i = jnp.where(in_warmup, warm_i, main_i)
        total = total + loss_s + loss_i
        metrics["scale"] = loss_s
        metrics["inp"] = loss_i
        metrics["scale_err"] = (
            jnp.sum(jnp.abs(pred_scale - gt_scale_pc) * v) / jnp.maximum(v.sum(), 1)
        )

    if cfg.nets_to_train in ("ae", "all"):
        # contrastive loss on corresponding patches (gigaPose.py:146-192).
        # src and tar go through ONE fused forward at batch 2B: numerically
        # identical (the ViT has no cross-example coupling) but half the
        # kernel dispatches and a bigger MXU batch than two B-sized applies.
        # INTERLEAVED (stack axis=1 then fold), not concatenated: under a
        # dp-sharded batch axis, concat along axis 0 would misalign result
        # rows with operand shards and make GSPMD insert collective-permutes
        # (cross-DCN on multi-host); interleaving keeps every example's two
        # images on the device that already holds it.
        stacked = jnp.stack([batch.src_img, batch.tar_img], axis=1)
        both = ae_net.apply(
            {"params": params["ae"]},
            stacked.reshape((2 * B,) + stacked.shape[2:]),
        )
        both = both.reshape((B, 2) + both.shape[1:])
        src_feat, tar_feat = both[:, 0], both[:, 1]
        src_g, sv = gather_patches(src_feat, batch.src_pts)
        tar_g, tv = gather_patches(tar_feat, batch.tar_pts)
        v = (sv & tv).reshape(-1)
        tau = cfg.tau
        if cfg.tau_start > 0 and cfg.tau_warmup_steps > 0:
            # linear anneal tau_start -> tau over tau_warmup_steps
            frac = jnp.clip(step / cfg.tau_warmup_steps, 0.0, 1.0)
            tau = cfg.tau_start + (cfg.tau - cfg.tau_start) * frac
        nce = L.info_nce_loss(
            src_g.reshape(-1, src_g.shape[-1]),
            tar_g.reshape(-1, tar_g.shape[-1]),
            v,
            tau=tau,
            compute_dtype=jnp.bfloat16 if cfg.nce_dtype == "bf16" else None,
        )
        total = total + nce
        metrics["infoNCE"] = nce
        pos = jnp.sum(src_g * tar_g, -1).reshape(-1)
        metrics["pos_sim"] = jnp.sum(pos * v) / jnp.maximum(v.sum(), 1)

    metrics["total"] = total
    return total, (metrics, new_stats)


def train_step(
    ae_net: AENet,
    ist_net: ISTNet,
    tx: optax.GradientTransformation,
    cfg: OptimConfig,
    state: TrainState,
    batch: TrainBatch,
):
    """One SGD step; pure function of (state, batch) — jit/pjit it."""
    params = {"ae": state.ae_params, "ist": state.ist_params}

    def loss_fn(p):
        return compute_losses(
            ae_net, ist_net, p, state.ist_batch_stats, batch, state.step, cfg
        )

    grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(params)
    updates, new_opt = tx.update(grads, state.opt_state, params)
    new_params = optax.apply_updates(params, updates)
    return (
        TrainState(
            step=state.step + 1,
            ae_params=new_params["ae"],
            ist_params=new_params["ist"],
            ist_batch_stats=new_stats,
            opt_state=new_opt,
        ),
        metrics,
    )
