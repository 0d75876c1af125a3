"""IST network: in-plane/scale regression from per-correspondence features.

Rebuild of the reference's ISTNet (src/models/network/ist_net.py:11-163) and
its ResNet backbone (src/models/network/resnet.py:318-381):

- backbone: bilinear-upsample the 224 crop to 256 (align_corners=True), then
  conv7x7/s2 + four 2-BasicBlock stages (dims 128/192/256/512, strides
  1/2/2/2) + 1x1 out-conv -> (B, 16, 16, 256) stride-16 features.
- regressor: per correspondence, concat(query_feat, template_feat) -> two
  3-layer MLPs: scale (1-d) and cos/sin in-plane (2-d, tanh + L2 normalize).

Differences from the reference, same capability:
- The reference compacts features at valid correspondences to a dynamic
  (sum(valid), 2C) matrix (ist_net.py:100-121). Here the heads run on all
  (B, N) gathered pairs in fixed shape; validity is a bool mask. The reference
  then scatters back to (B, N) grids with -1000 fill — consumers here read the
  mask instead, and a -1000-filled view is provided for host parity checks.
- Optional SpatialTransformer attention stages (n_heads>0, off in the default
  config) are supported via `num_attn_heads`.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gigapose_tpu.ops.gather import gather_patches


def resize_bilinear_align_corners(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize with align_corners=True semantics (torch
    F.interpolate(..., align_corners=True), used at resnet.py:364-367)."""
    B, H, W, C = x.shape
    oh, ow = size
    ys = jnp.linspace(0.0, H - 1.0, oh)
    xs = jnp.linspace(0.0, W - 1.0, ow)
    y0 = jnp.floor(ys).astype(jnp.int32).clip(0, H - 2)
    x0 = jnp.floor(xs).astype(jnp.int32).clip(0, W - 2)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x0 + 1) * wx
    bot = g(y0 + 1, x0) * (1 - wx) + g(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: object = None  # bf16 convs on the MXU; BatchNorm/residual stay f32
    # BN output dtype (flax computes the batch statistics in f32 REGARDLESS,
    # flax.linen.normalization._compute_stats upcasts) — bf16 halves the
    # normalized-activation HBM traffic in train mode; default f32 preserves
    # the measured serving numerics
    norm_dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.norm_dtype, name=name
        )
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype, name="down_conv")(x)
            x = norm("down_bn")(x)
        return nn.relu(x + y)


class CrossAttention(nn.Module):
    """Multi-head attention over token sequences; context=None degenerates to
    self-attention (the stable-diffusion-derived CrossAttention the reference
    embeds, resnet.py:174-224). Logits accumulate in f32 like the reference's
    fp32 _ATTN_PRECISION path."""

    query_dim: int
    num_heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, context=None):
        ctx = x if context is None else context
        inner = self.num_heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)
        split = lambda t: t.reshape(t.shape[0], -1, self.num_heads, self.head_dim)
        q, k, v = split(q), split(k), split(v)
        sim = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * self.head_dim**-0.5
        attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        o = o.reshape(o.shape[0], -1, inner)
        return nn.Dense(self.query_dim, name="to_out")(o)


class BasicTransformerBlock(nn.Module):
    """norm -> self-attn -> norm -> cross-attn(context|self) -> norm -> GEGLU
    feed-forward, all residual (resnet.py:227-252)."""

    dim: int
    num_heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, context=None):
        x = x + CrossAttention(self.dim, self.num_heads, self.head_dim,
                               name="attn1")(nn.LayerNorm(name="norm1")(x))
        x = x + CrossAttention(self.dim, self.num_heads, self.head_dim,
                               name="attn2")(nn.LayerNorm(name="norm2")(x),
                                             context=context)
        h = nn.LayerNorm(name="norm3")(x)
        # GEGLU feed-forward (resnet.py:76-104, glu=True)
        hg = nn.Dense(self.dim * 4 * 2, name="ff_proj")(h)
        h1, gate = jnp.split(hg, 2, axis=-1)
        h = h1 * jax.nn.gelu(gate)
        return x + nn.Dense(self.dim, name="ff_out")(h)


class SpatialTransformer(nn.Module):
    """The reference's full SpatialTransformer stage (resnet.py:256-315):
    GroupNorm -> 1x1 proj_in -> transformer blocks (self + cross attention +
    GEGLU FF) -> zero-initialized 1x1 proj_out -> residual. context=None makes
    the cross-attention self-attention — exactly how the ResNet backbone calls
    it (resnet.py:374-378); pass (B, N, C) context tokens to enable the
    cross-attention variant. n_heads=0 in the shipped config disables the
    stage entirely."""

    dim: int
    num_heads: int
    depth: int = 1

    @nn.compact
    def __call__(self, x, context=None):
        B, H, W, C = x.shape
        hd = C // self.num_heads
        # reference hard-codes 32 groups (its dims are all multiples of 32,
        # resnet.py:116); fall back to a divisor for tiny test configs
        import math

        ng = 32 if C % 32 == 0 else int(math.gcd(C, 32))
        h = nn.GroupNorm(num_groups=max(ng, 1), epsilon=1e-6, name="norm")(x)
        h = nn.Conv(self.num_heads * hd, (1, 1), name="proj_in")(h)
        h = h.reshape(B, H * W, -1)
        for d in range(self.depth):
            h = BasicTransformerBlock(
                self.num_heads * hd, self.num_heads, hd, name=f"block{d}"
            )(h, context=context)
        h = h.reshape(B, H, W, -1)
        # zero-init proj_out: the stage starts as identity (resnet.py:296-300)
        h = nn.Conv(C, (1, 1), kernel_init=nn.initializers.zeros,
                    name="proj_out")(h)
        return x + h


# backwards-compatible alias (r1 name for the collapsed variant)
SelfAttention2d = SpatialTransformer


class ISTBackbone(nn.Module):
    """(B, 3, 224, 224) -> (B, P, C) stride-16 descriptor grid."""

    initial_dim: int = 128
    block_dims: Sequence[int] = (128, 192, 256, 512)
    descriptor_size: int = 256
    input_size: int = 256
    num_attn_heads: int = 0
    # "bfloat16" runs every conv on the MXU in bf16 while BatchNorm, the
    # residual stream, and the output descriptors stay f32 (same policy as
    # the ViT's compute_dtype; the IST forward was 6.15 ms of the 14.2 ms
    # ViT-S pipeline at f32 — BENCH r2)
    compute_dtype: str = None
    # "bfloat16" additionally emits BatchNorm outputs in bf16 (stats still
    # f32 inside flax) — a train-forward HBM-traffic knob, A/B'd on-chip
    norm_dtype: str = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cdt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        ndt = jnp.bfloat16 if self.norm_dtype == "bfloat16" else jnp.float32
        x = jnp.transpose(images, (0, 2, 3, 1))  # NHWC
        x = resize_bilinear_align_corners(x, (self.input_size, self.input_size))
        x = nn.Conv(self.initial_dim, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=cdt, name="conv1")(x)
        x = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=ndt, name="bn1")(x)
        )
        for i, (dim, stride) in enumerate(zip(self.block_dims, (1, 2, 2, 2))):
            x = BasicBlock(dim, stride, dtype=cdt, norm_dtype=ndt,
                           name=f"layer{i + 1}_0")(x, train)
            x = BasicBlock(dim, 1, dtype=cdt, norm_dtype=ndt,
                           name=f"layer{i + 1}_1")(x, train)
            if self.num_attn_heads > 0 and i in (1, 3):
                x = SelfAttention2d(dim, self.num_attn_heads, name=f"attention{i//2 + 1}")(x)
        x = nn.Conv(self.descriptor_size, (1, 1), use_bias=False, dtype=cdt,
                    name="out_conv")(x)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C).astype(jnp.float32)


class Regressor(nn.Module):
    hidden_dim: int = 256
    use_tanh: bool = True
    normalize_output: bool = True

    @nn.compact
    def __call__(self, pair_feats: jnp.ndarray):
        """(..., 2C) concat(tar, src) features -> (scale (...,), cossin (..., 2))."""
        def mlp(x, out_dim, name):
            x = nn.relu(nn.Dense(self.hidden_dim * 2, name=f"{name}_fc1")(x))
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"{name}_fc2")(x))
            return nn.Dense(out_dim, name=f"{name}_fc3")(x)

        scale = mlp(pair_feats, 1, "scale")[..., 0]
        cossin = mlp(pair_feats, 2, "inplane")
        if self.use_tanh:
            cossin = jnp.tanh(cossin)
        if self.normalize_output:
            cossin = cossin / jnp.linalg.norm(cossin, axis=-1, keepdims=True).clip(1e-8)
        return scale, cossin


class ISTResult(NamedTuple):
    scale: jnp.ndarray  # (..., N)
    cossin: jnp.ndarray  # (..., N, 2)
    valid: jnp.ndarray  # (..., N) bool


class ISTNet(nn.Module):
    backbone: ISTBackbone
    regressor: Regressor

    def features(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.backbone(images, train)

    def regress(
        self,
        src_feat: jnp.ndarray,
        tar_feat: jnp.ndarray,
        src_pts: jnp.ndarray,
        tar_pts: jnp.ndarray,
    ) -> ISTResult:
        """Per-correspondence regression from precomputed feature grids.

        src_feat/tar_feat: (B, P, C); src_pts/tar_pts: (B, N, 2) patch coords,
        (-1,-1) invalid. Equivalent of the reference's inference()
        (ist_net.py:100-121) without the compaction/scatter dance.
        """
        src_g, src_v = gather_patches(src_feat, src_pts)
        tar_g, tar_v = gather_patches(tar_feat, tar_pts)
        pair = jnp.concatenate([tar_g, src_g], axis=-1)
        scale, cossin = self.regressor(pair)
        valid = src_v & tar_v
        return ISTResult(scale=scale, cossin=cossin, valid=valid)

    def __call__(
        self,
        src_img: jnp.ndarray,
        tar_img: jnp.ndarray,
        src_pts: jnp.ndarray,
        tar_pts: jnp.ndarray,
        train: bool = False,
    ) -> ISTResult:
        """End-to-end (the reference's forward, ist_net.py:53-70)."""
        src_feat = self.backbone(src_img, train)
        tar_feat = self.backbone(tar_img, train)
        return self.regress(src_feat, tar_feat, src_pts, tar_pts)


def fill_invalid(result: ISTResult, fill: float = -1000.0):
    """Host-parity view with the reference's -1000 sentinel (ist_net.py:112-118)."""
    scale = jnp.where(result.valid, result.scale, fill)
    cossin = jnp.where(result.valid[..., None], result.cossin, fill)
    return scale, cossin


def default_ist_net(
    descriptor_size: int = 256,
    num_attn_heads: int = 0,
    compute_dtype: str = None,
    norm_dtype: str = None,
) -> ISTNet:
    return ISTNet(
        backbone=ISTBackbone(
            descriptor_size=descriptor_size,
            num_attn_heads=num_attn_heads,
            compute_dtype=compute_dtype,
            norm_dtype=norm_dtype,
        ),
        regressor=Regressor(hidden_dim=descriptor_size),
    )
