"""DINOv2-style ViT in flax — the AE (appearance embedding) backbone.

Capability parity with the reference's torch-hub DINOv2 models
(src/models/network/ae_net.py:10-15 supports vits/b/l/g at patch 14); this is
a from-scratch flax implementation of that architecture so torch checkpoints
convert 1:1 (see models/convert.py):

- patch embed: 14x14 conv, stride 14 (224 -> 16x16 tokens + CLS)
- pre-norm transformer blocks with LayerScale on both branches
- GELU MLP (vits/b/l) or SwiGLU-ffn (vitg)
- `x_prenorm` tap point: token states after the last block, *before* the final
  LayerNorm — the reference reads features there (ae_net.py:65).

TPU notes: attention is a plain fused-einsum softmax(QK^T)V — at 257 tokens
the sequence is tiny and XLA's fusion is already near roofline; the batch axis
provides the parallelism. All matmuls inherit the caller's dtype policy
(bfloat16 activations recommended), accumulating in f32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int = 14
    mlp_ratio: float = 4.0
    ffn_layer: str = "mlp"  # "mlp" | "swiglu"
    layerscale_init: float = 1e-5
    num_register_tokens: int = 0
    # mixed precision: "bfloat16" runs every matmul (qkv/proj/mlp/patch-embed)
    # in bf16 on the MXU while LayerNorm, LayerScale, softmax, and the
    # residual stream stay f32 (params are stored f32 and cast at use)
    compute_dtype: Optional[str] = None
    # gradient rematerialization: recompute each block in the backward pass
    # instead of keeping its activations (jax.checkpoint via nn.remat) —
    # trades ~30% more forward FLOPs for O(depth) less activation HBM, the
    # standard lever for growing the per-chip train batch. Forward-only
    # inference is unaffected (XLA drops the checkpoint marker).
    # False = no remat; True = full per-block remat; a string names a
    # jax.checkpoint_policies entry (e.g. "dots_saveable": keep matmul
    # outputs, recompute only the cheap elementwise tail — less recompute
    # FLOPs than full remat at a fraction of the no-remat activation HBM).
    remat: Any = False
    # tensor parallelism: a (dp, mp) jax.sharding.Mesh. Params are sharded by
    # parallel.tp (Megatron name rules); the one activation annotation the
    # compiler can't infer — heads-on-"mp" for the qkv reshape — is applied in
    # Attention. None = single-device/dp-only (the default).
    tp_mesh: Any = None

    @property
    def matmul_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None


VIT_CONFIGS = {
    "dinov2_vits14": ViTConfig(embed_dim=384, depth=12, num_heads=6),
    "dinov2_vitb14": ViTConfig(embed_dim=768, depth=12, num_heads=12),
    "dinov2_vitl14": ViTConfig(embed_dim=1024, depth=24, num_heads=16),
    "dinov2_vitg14": ViTConfig(
        embed_dim=1536, depth=40, num_heads=24, mlp_ratio=8 / 3, ffn_layer="swiglu"
    ),
    # tiny configs for CPU tests / smoke runs (not reference models)
    "vit_tiny_test": ViTConfig(embed_dim=64, depth=2, num_heads=2),
    # mid-depth fixture for the int8 trained-weights gate (VERDICT r4 #3):
    # 6 blocks of residual-stream growth at dim 256 — deep enough to
    # measure the outlier-activation trend over depth, small enough to
    # train on the rendered fixture in-env
    "vit_deep_test": ViTConfig(embed_dim=256, depth=6, num_heads=4),
    "vit_tiny_swiglu_test": ViTConfig(
        embed_dim=64, depth=2, num_heads=2, mlp_ratio=8 / 3, ffn_layer="swiglu"
    ),
}


class LayerScale(nn.Module):
    dim: int
    init: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init), (self.dim,))
        return x * gamma


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = None
    tp_mesh: Any = None

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, hd)
        if self.tp_mesh is not None:
            from gigapose_tpu.parallel.tp import constrain_heads

            qkv = constrain_heads(qkv, self.tp_mesh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)
        # plain fused-einsum attention: measured fastest on v5e at 257 tokens
        # against jax.nn.dot_product_attention (43.1 vs 26.2 ms, ViT-L B=16)
        # and two generations of hand-written Pallas kernels (30.1 ms best) —
        # XLA's own lowering keeps the short-sequence logits fused
        # (full record: ROUND_NOTES r2/r3)
        scale = hd ** -0.5
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class SwiGLU(nn.Module):
    """DINOv2-giant FFN: SwiGLU with fused w12 projection."""

    dim: int
    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x12 = nn.Dense(2 * self.hidden, dtype=self.dtype, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, name="w3")(nn.silu(x1) * x2)


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        cdt = c.matmul_dtype
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = Attention(c.embed_dim, c.num_heads,
                      dtype=cdt, tp_mesh=c.tp_mesh, name="attn")(h)
        x = x + LayerScale(c.embed_dim, c.layerscale_init, name="ls1")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        hidden = int(c.embed_dim * c.mlp_ratio)
        if c.ffn_layer == "swiglu":
            # dinov2 rounds the swiglu hidden dim to a multiple of 8
            hidden = (int(hidden * 2 / 3) + 7) // 8 * 8
            h = SwiGLU(c.embed_dim, hidden, dtype=cdt, name="mlp")(h)
        else:
            h = Mlp(c.embed_dim, hidden, dtype=cdt, name="mlp")(h)
        x = x + LayerScale(c.embed_dim, c.layerscale_init, name="ls2")(h)
        return x


class ViT(nn.Module):
    """Returns dict(x_prenorm=(B, 1+P, C), x_norm=(B, 1+P, C)).

    Input: (B, 3, H, W) with H, W multiples of patch_size (224 default).
    """

    cfg: ViTConfig
    pos_embed_size: int = 16  # grid side the positional embedding is stored at

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> dict:
        c = self.cfg
        B, _, H, W = images.shape
        gh, gw = H // c.patch_size, W // c.patch_size

        x = jnp.transpose(images, (0, 2, 3, 1))  # NHWC for TPU convs
        x = nn.Conv(
            c.embed_dim,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            dtype=c.matmul_dtype,
            name="patch_embed",
        )(x)
        x = x.astype(jnp.float32)
        x = x.reshape(B, gh * gw, c.embed_dim)

        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, c.embed_dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, 1 + self.pos_embed_size**2, c.embed_dim),
        )
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (self.pos_embed_size, self.pos_embed_size):
            p = pos_patch.reshape(1, self.pos_embed_size, self.pos_embed_size, -1)
            p = jax.image.resize(p, (1, gh, gw, c.embed_dim), method="bicubic")
            pos_patch = p.reshape(1, gh * gw, c.embed_dim)

        x = x + pos_patch
        cls_tok = jnp.broadcast_to(cls + pos_cls, (B, 1, c.embed_dim))
        x = jnp.concatenate([cls_tok, x], axis=1)

        if c.num_register_tokens:
            reg = self.param(
                "register_tokens",
                nn.initializers.truncated_normal(0.02),
                (1, c.num_register_tokens, c.embed_dim),
            )
            x = jnp.concatenate(
                [x[:, :1], jnp.broadcast_to(reg, (B, c.num_register_tokens, c.embed_dim)), x[:, 1:]],
                axis=1,
            )

        if c.remat:
            policy = (
                getattr(jax.checkpoint_policies, c.remat)
                if isinstance(c.remat, str) else None
            )
            block_cls = nn.remat(Block, policy=policy)
        else:
            block_cls = Block
        for i in range(c.depth):
            x = block_cls(c, name=f"block{i}")(x)

        x_prenorm = x.astype(jnp.float32)
        x = x_prenorm
        x_norm = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        if c.num_register_tokens:
            # drop register tokens so token layout is always [cls, patches]
            keep = jnp.concatenate(
                [x_prenorm[:, :1], x_prenorm[:, 1 + c.num_register_tokens :]], axis=1
            )
            keep_n = jnp.concatenate(
                [x_norm[:, :1], x_norm[:, 1 + c.num_register_tokens :]], axis=1
            )
            return {"x_prenorm": keep, "x_norm": keep_n}
        return {"x_prenorm": x_prenorm, "x_norm": x_norm}
