"""Fused Pallas attention == the XLA einsum path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from gigapose_tpu.ops.pallas_attention import fused_attention


def _reference(q, k, v):
    hd = q.shape[-1]
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * hd**-0.5, k)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def test_fused_attention_matches_einsum():
    rng = np.random.default_rng(0)
    for B, N, H, d in [(2, 257, 4, 32), (1, 17, 2, 16), (3, 64, 2, 64)]:
        q = jnp.asarray(rng.normal(size=(B, N, H, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, N, H, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, N, H, d)), jnp.float32)
        got = fused_attention(q, k, v, interpret=True)
        want = _reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_vit_with_fused_attention_matches_default():
    import dataclasses

    from gigapose_tpu.models.vit import ViT, ViTConfig

    cfg = ViTConfig(embed_dim=64, depth=2, num_heads=2)
    cfg_fused = dataclasses.replace(cfg, fused_attention=True)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 56, 56)), jnp.float32)
    vit = ViT(cfg, pos_embed_size=4)
    params = vit.init(jax.random.PRNGKey(0), x)
    want = vit.apply(params, x)["x_prenorm"]
    # same params drive the fused variant (identical tree structure)
    from jax.experimental.pallas import tpu as pltpu

    vit_f = ViT(cfg_fused, pos_embed_size=4)
    with pltpu.force_tpu_interpret_mode():
        got = vit_f.apply(params, x)["x_prenorm"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)
