"""Training losses (ref: src/models/loss.py:16-95).

All mask-aware: the reference compacts valid correspondences before computing
losses (gather at src/models/gigaPose.py:160-168); we keep fixed shapes and
weight by the validity mask, which yields the same mean over valid elements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def pairwise_cosine(a: jnp.ndarray, b: jnp.ndarray, normalize: bool = True):
    """(N, C) x (M, C) -> (N, M) cosine similarity (ref: cosine_similarity)."""
    if normalize:
        a = a / jnp.linalg.norm(a, axis=-1, keepdims=True).clip(1e-8)
        b = b / jnp.linalg.norm(b, axis=-1, keepdims=True).clip(1e-8)
    return a @ b.T


def info_nce_loss(
    query_feat: jnp.ndarray,
    ref_feat: jnp.ndarray,
    valid: jnp.ndarray,
    tau: float = 0.1,
    compute_dtype=None,
) -> jnp.ndarray:
    """InfoNCE over positive correspondence pairs with in-batch negatives
    (ref: InfoNCE, src/models/loss.py:71-86, tau=0.1).

    query_feat/ref_feat: (N, C) matched pairs (row i of query matches row i of
    ref); valid: (N,) bool. Invalid rows are excluded from both the logits'
    label set (their columns are masked) and the loss mean — matching the
    reference, which physically removes them before the (N_valid, N_valid)
    logit matrix.

    compute_dtype=jnp.bfloat16 stores the (N, N) logit matrix in bf16 —
    half the HBM traffic of the dominant loss-side tensor at train scale
    (N = B*P = 6144 at B=24 -> 151 MB in f32). The logsumexp accumulates in
    f32 and the positive logit is taken from the matched pair rows directly
    (full f32), so only the NEGATIVE logits see bf16 rounding (~3 decimal
    digits on cosine/tau values in [-10, 10]).
    """
    q = query_feat / jnp.linalg.norm(query_feat, axis=-1, keepdims=True).clip(1e-8)
    r = ref_feat / jnp.linalg.norm(ref_feat, axis=-1, keepdims=True).clip(1e-8)
    denom = jnp.maximum(jnp.sum(valid), 1)
    labels = jnp.arange(query_feat.shape[0])
    if compute_dtype is not None:
        pos = jnp.sum(q * r, axis=-1) / tau  # (N,) exact f32 positive logits
        logits = (q.astype(compute_dtype) @ r.T.astype(compute_dtype)) / jnp.asarray(
            tau, compute_dtype
        )
        # invalid columns cannot act as negatives; the diagonal must carry
        # the same (bf16) value inside the logsumexp that rounds everything
        neg_inf = jnp.asarray(-1e9, compute_dtype)
        logits = jnp.where(valid[None, :], logits, neg_inf)
        m = jax.lax.stop_gradient(jnp.max(logits, axis=1)).astype(jnp.float32)
        sumexp = jnp.sum(
            jnp.exp(logits.astype(jnp.float32) - m[:, None]), axis=1
        )  # convert fuses into the reduce: no f32 (N, N) materializes
        lse = m + jnp.log(sumexp)
        # replace the bf16 diagonal contribution with the exact one
        diag_b16 = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
        lse = lse + jnp.log1p(
            (jnp.exp(pos - lse) - jnp.exp(diag_b16.astype(jnp.float32) - lse))
        )
        losses = lse - pos
        return jnp.sum(losses * valid) / denom
    logits = (q @ r.T) / tau  # (N, N)
    # mask invalid columns so they cannot act as negatives
    logits = jnp.where(valid[None, :], logits, -1e9)
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return jnp.sum(losses * valid) / denom


def scale_loss(
    pred: jnp.ndarray, gt: jnp.ndarray, valid: jnp.ndarray, log: bool = True,
    loss: str = "l2",
) -> jnp.ndarray:
    """L2 (or L1) on (log-)scale (ref: ScaleLoss, loss.py:16-35; log+l2 default)."""
    if log:
        pred = jnp.log(jnp.clip(pred, 1e-6))
        gt = jnp.log(gt)
    err = jnp.abs(pred - gt) if loss == "l1" else (pred - gt) ** 2
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(err * valid) / denom


def inplane_loss(
    pred_cossin: jnp.ndarray,
    gt_cossin: jnp.ndarray,
    valid: jnp.ndarray,
    loss: str = "geodesic",
    normalize: bool = False,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Geodesic (or lp) loss on [cos, sin] (ref: InplaneLoss, loss.py:38-68)."""
    if normalize:
        pred_cossin = pred_cossin / jnp.linalg.norm(pred_cossin, axis=-1, keepdims=True).clip(1e-8)
        gt_cossin = gt_cossin / jnp.linalg.norm(gt_cossin, axis=-1, keepdims=True).clip(1e-8)
    denom = jnp.maximum(jnp.sum(valid), 1)
    if loss == "geodesic":
        cos_diff = jnp.clip(jnp.sum(pred_cossin * gt_cossin, -1), -1 + eps, 1 - eps)
        err = jnp.arccos(cos_diff)
        return jnp.sum(err * valid) / denom
    err = jnp.abs(pred_cossin - gt_cossin) if loss == "l1" else (pred_cossin - gt_cossin) ** 2
    return jnp.sum(jnp.mean(err, -1) * valid) / denom


def l2_warmup_losses(pred_scale, pred_cossin, gt_scale, gt_cossin, valid):
    """Plain MSE warm-up (ref: gigaPose.py:224-236, first warm_up_steps)."""
    denom = jnp.maximum(jnp.sum(valid), 1)
    s = jnp.sum((pred_scale - gt_scale) ** 2 * valid) / denom
    i = jnp.sum(jnp.mean((pred_cossin - gt_cossin) ** 2, -1) * valid) / denom
    return s, i
