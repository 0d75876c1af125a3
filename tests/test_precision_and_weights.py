"""bf16 feature-store retrieval stability (SURVEY §7 hard part 6) and the
partial torch-weight loader."""

import jax.numpy as jnp
import numpy as np
import pytest

from gigapose_tpu.ops.matching import match_templates


def test_bf16_store_preserves_topk():
    """The 0.5-cosine threshold is calibrated in f32; verify a bf16 template
    store yields the same top-1 retrieval on a realistic separation margin."""
    rng = np.random.default_rng(0)
    B, N, P, C = 4, 16, 64, 128
    npat = 8
    tar = rng.normal(size=(B, P, C)).astype(np.float32)
    src = rng.normal(size=(B, N, P, C)).astype(np.float32)
    v_star = rng.integers(0, N, B)
    for b in range(B):
        take = rng.integers(0, P, P // 2)
        src[b, v_star[b], take] = tar[b, take] + 0.1 * rng.normal(size=(len(take), C))
    tar /= np.linalg.norm(tar, axis=-1, keepdims=True)
    src /= np.linalg.norm(src, axis=-1, keepdims=True)
    masks_t = np.ones((B, P), np.float32)
    masks_s = np.ones((B, N, P), np.float32)

    kw = dict(k=3, sim_threshold=0.5, patch_threshold=2, num_patches=npat)
    r32 = match_templates(
        jnp.asarray(tar), jnp.asarray(src), jnp.asarray(masks_t),
        jnp.asarray(masks_s), **kw,
    )
    r16 = match_templates(
        jnp.asarray(tar, jnp.bfloat16), jnp.asarray(src, jnp.bfloat16),
        jnp.asarray(masks_t), jnp.asarray(masks_s), **kw,
    )
    np.testing.assert_array_equal(np.asarray(r32.ids[:, 0]), v_star)
    np.testing.assert_array_equal(np.asarray(r16.ids[:, 0]), v_star)
    # scores agree to bf16 tolerance
    np.testing.assert_allclose(
        np.asarray(r16.scores, np.float32), np.asarray(r32.scores), atol=0.02
    )


def test_vit_bf16_compute_preserves_features():
    """compute_dtype='bfloat16' (bf16 matmuls, f32 LN/residual/softmax)
    leaves the L2-normalized patch features essentially unchanged — gate for
    running the flagship ViT in mixed precision on the MXU."""
    import jax

    from gigapose_tpu.models.ae_net import AENet

    ae32 = AENet(model_name="vit_tiny_test")
    ae16 = AENet(model_name="vit_tiny_test", compute_dtype="bfloat16")
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3, 56, 56)), jnp.float32
    )
    p = ae32.init(jax.random.PRNGKey(0), x)  # same params for both
    f32 = np.asarray(ae32.apply(p, x))
    f16 = np.asarray(ae16.apply(p, x))
    assert f16.dtype == np.float32  # features come out f32 (L2-norm in f32)
    cos = (f32 * f16).sum(-1)
    assert cos.min() > 0.995


def test_partial_load_torch_ist_backbone():
    """Load a torch-style state dict into the IST backbone with remapping and
    shape checks (the LoFTR warm-start path, ref train.py:84 + weight.py)."""
    import jax

    from gigapose_tpu.models.ist_net import ISTBackbone
    from gigapose_tpu.utils.weight import partial_load_torch

    bb = ISTBackbone(initial_dim=8, block_dims=(8, 8, 12, 16), descriptor_size=16,
                     input_size=64)
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)), False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    rng = np.random.default_rng(1)
    sd = {
        # matches conv1 (7x7x3x8 flax <-> 8x3x7x7 torch)
        "backbone.conv1.weight": rng.normal(size=(8, 3, 7, 7)).astype(np.float32),
        # matches bn1 scale/bias + running stats
        "backbone.bn1.weight": rng.normal(size=8).astype(np.float32),
        "backbone.bn1.bias": rng.normal(size=8).astype(np.float32),
        "backbone.bn1.running_mean": rng.normal(size=8).astype(np.float32),
        "backbone.bn1.running_var": np.abs(rng.normal(size=8)).astype(np.float32),
        # torch indexed submodule: layer1.0.conv1 -> layer1_0/conv1
        "backbone.layer1.0.conv1.weight": rng.normal(size=(8, 8, 3, 3)).astype(np.float32),
        # shape mismatch: must be skipped, not crash
        "backbone.layer1.0.conv2.weight": rng.normal(size=(99, 8, 3, 3)).astype(np.float32),
        # unknown key: ignored
        "backbone.nonexistent.weight": rng.normal(size=(4, 4)).astype(np.float32),
    }
    new_params, new_stats, n = partial_load_torch(
        params, sd, prefix="backbone.", batch_stats=stats
    )
    assert n == 6
    np.testing.assert_allclose(
        new_params["conv1"]["kernel"],
        sd["backbone.conv1.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(new_params["bn1"]["scale"], sd["backbone.bn1.weight"])
    np.testing.assert_allclose(
        new_stats["bn1"]["mean"], sd["backbone.bn1.running_mean"]
    )
    np.testing.assert_allclose(
        new_params["layer1_0"]["conv1"]["kernel"],
        sd["backbone.layer1.0.conv1.weight"].transpose(2, 3, 1, 0),
    )
    # mismatched conv2 untouched
    np.testing.assert_allclose(
        new_params["layer1_0"]["conv2"]["kernel"], params["layer1_0"]["conv2"]["kernel"]
    )


def test_ist_bf16_compute_preserves_features():
    """ISTBackbone compute_dtype='bfloat16' (bf16 convs, f32 BatchNorm/
    residual/output) keeps the descriptor grid close to f32 — gate for the
    mixed-precision IST default (the IST forward was 43% of the ViT-S
    pipeline at f32, BENCH r2)."""
    import jax

    from gigapose_tpu.models.ist_net import ISTBackbone

    kw = dict(initial_dim=16, block_dims=(16, 16, 24, 32),
              descriptor_size=32, input_size=64)
    b32 = ISTBackbone(**kw)
    b16 = ISTBackbone(**kw, compute_dtype="bfloat16")
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3, 56, 56)), jnp.float32
    )
    v = b32.init(jax.random.PRNGKey(0), x)  # same params/stats for both
    f32 = np.asarray(b32.apply(v, x))
    f16 = np.asarray(b16.apply(v, x))
    assert f16.dtype == np.float32
    denom = np.linalg.norm(f32, axis=-1) * np.linalg.norm(f16, axis=-1)
    cos = (f32 * f16).sum(-1) / np.clip(denom, 1e-12, None)
    assert cos.min() > 0.99

