"""Fused multi-head attention Pallas kernel for short sequences.

The AE ViT runs 257-token sequences (16x16 patches + CLS) at large batch
(SURVEY §5: the "long axis" of this workload is batch, not sequence). A whole
(N, d) head fits comfortably in VMEM, so instead of FlashAttention's K-tiling
we fuse the entire softmax(QK^T)V per (batch, head) grid step — the
(B, H, N, N) logits never reach HBM, and the MXU sees two dense (N, d)x(d, N)
/ (N, N)x(N, d) matmuls per step.

Sequence length is padded to the f32 sublane multiple (8); padded keys are
masked to -inf before the softmax. Equivalence with the XLA einsum path is
tested in interpret mode; models/vit.py switches via ViTConfig.fused_attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    q = q_ref[0]  # (Np, d)
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Np, Np)
    Np = logits.shape[-1]
    if n_valid < Np:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(key_ids < n_valid, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def fused_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(B, N, H, d) q/k/v -> (B, N, H, d) attention output."""
    B, N, H, d = q.shape
    if jax.default_backend() != "tpu":
        interpret = True  # Mosaic kernels only compile for TPU
    scale = d ** -0.5
    Np = ((N + 7) // 8) * 8
    dp = ((d + 127) // 128) * 128

    def pack(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, N, d)
        return jnp.pad(x, ((0, 0), (0, Np - N), (0, dp - d)))

    qp, kp, vp = pack(q), pack(k), pack(v)
    kernel = functools.partial(_attn_kernel, n_valid=N, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Np, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Np, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Np, dp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Np, dp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, dp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    out = out[:, :N, :d].reshape(B, H, N, d)
    return jnp.transpose(out, (0, 2, 1, 3))
