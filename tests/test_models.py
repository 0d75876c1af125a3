"""Model forward shapes + numerical parity of the flax ViT against the local
torch DINOv2 implementation in `transformers` (random-init, weight-converted).

This box has ONE CPU core: default tests use tiny configs; full-size forwards
are marked `slow` and meant for the TPU chip (bench.py exercises them)."""

import os

# keep transformers fully offline and TF-free (zero-egress box; TF import
# alone costs ~15 s of the single core)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("USE_TF", "0")
os.environ.setdefault("USE_FLAX", "0")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigapose_tpu.models.ae_net import AENet
from gigapose_tpu.models.ist_net import (
    ISTBackbone,
    ISTNet,
    Regressor,
    fill_invalid,
    resize_bilinear_align_corners,
)
from gigapose_tpu.models.vit import ViT, VIT_CONFIGS
from gigapose_tpu.models import losses


def tiny_ist_net():
    return ISTNet(
        backbone=ISTBackbone(
            initial_dim=16, block_dims=(16, 16, 24, 32), descriptor_size=32,
            input_size=64,
        ),
        regressor=Regressor(hidden_dim=32),
    )


def test_ae_net_tiny_forward():
    net = AENet(model_name="vit_tiny_test")
    x = jnp.zeros((2, 3, 56, 56))  # 4x4 patch grid
    params = net.init(jax.random.PRNGKey(0), x)
    feats = jax.jit(net.apply)(params, x)
    assert feats.shape == (2, 16, 64)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-5
    )


@pytest.mark.slow
def test_ae_net_vits_forward():
    net = AENet(model_name="dinov2_vits14")
    x = jnp.zeros((2, 3, 224, 224))
    params = net.init(jax.random.PRNGKey(0), x)
    feats = jax.jit(net.apply)(params, x)
    assert feats.shape == (2, 256, 384)


def test_ist_net_forward_and_regress():
    net = tiny_ist_net()
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 3, 64, 64)), jnp.float32)  # 4x4 grid
    pts = jnp.asarray(rng.integers(-1, 4, size=(2, 8, 2)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), img, img, pts, pts)
    res = net.apply(variables, img, img, pts, pts)
    assert res.scale.shape == (2, 8)
    assert res.cossin.shape == (2, 8, 2)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(res.cossin), axis=-1), 1.0, atol=1e-5
    )
    s, cs = fill_invalid(res)
    v = np.asarray(res.valid)
    assert np.all(np.asarray(s)[~v] == -1000)
    feats = net.apply(variables, img, method=net.features)
    assert feats.shape == (2, 16, 32)


def test_resize_align_corners_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), (48, 48), mode="bilinear", align_corners=True
    ).numpy()
    got = resize_bilinear_align_corners(jnp.asarray(x.transpose(0, 2, 3, 1)), (48, 48))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


def test_vit_matches_transformers_dinov2():
    """Random-init torch DINOv2 (transformers) == our flax ViT after weight
    conversion; gates the torch-checkpoint parity path (SURVEY §7 hard part 1)."""
    import torch
    from transformers import Dinov2Config, Dinov2Model

    from gigapose_tpu.models.convert import dinov2_hf_to_flax
    from gigapose_tpu.models.vit import ViTConfig

    cfg_t = Dinov2Config(
        hidden_size=96,
        num_hidden_layers=3,
        num_attention_heads=4,
        mlp_ratio=4,
        image_size=56,
        patch_size=14,
        layerscale_value=1e-5,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    model_t = Dinov2Model(cfg_t).eval()
    with torch.no_grad():
        for n, p in model_t.named_parameters():
            if "lambda1" in n or "position_embeddings" in n or "cls_token" in n:
                p.copy_(torch.randn_like(p) * 0.05)

    x = np.random.default_rng(2).normal(size=(2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        out_t = model_t(torch.from_numpy(x)).last_hidden_state.numpy()

    cfg_j = ViTConfig(embed_dim=96, depth=3, num_heads=4)
    vit = ViT(cfg_j, pos_embed_size=4)
    params = dinov2_hf_to_flax(model_t.state_dict(), depth=3)
    out_j = vit.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j["x_norm"]), out_t, atol=2e-4)


def test_info_nce_matches_compacted():
    """Masked InfoNCE == reference-style compacted cross-entropy."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    N, C = 24, 16
    q = rng.normal(size=(N, C)).astype(np.float32)
    r = q + 0.3 * rng.normal(size=(N, C)).astype(np.float32)
    valid = rng.uniform(size=N) > 0.3

    qs, rs = q[valid], r[valid]
    qt = F.normalize(torch.from_numpy(qs), dim=1)
    rt = F.normalize(torch.from_numpy(rs), dim=1)
    logits = qt @ rt.t() / 0.1
    want = F.cross_entropy(logits, torch.arange(int(valid.sum()))).item()

    got = losses.info_nce_loss(
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid), tau=0.1
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_info_nce_bf16_logits_close_and_f32_exact():
    """The bf16-logit-matrix path (OptimConfig.nce_dtype="bf16"): with
    compute_dtype=f32 it reproduces the optax path to float tolerance; with
    bf16 the loss and its gradients stay within bf16 rounding of the f32
    value (only negative logits see the rounding)."""
    rng = np.random.default_rng(5)
    N, C = 48, 16
    q = rng.normal(size=(N, C)).astype(np.float32)
    r = q + 0.3 * rng.normal(size=(N, C)).astype(np.float32)
    valid = jnp.asarray(rng.uniform(size=N) > 0.3)

    base = losses.info_nce_loss(jnp.asarray(q), jnp.asarray(r), valid, tau=0.1)
    same = losses.info_nce_loss(jnp.asarray(q), jnp.asarray(r), valid, tau=0.1,
                                compute_dtype=jnp.float32)
    np.testing.assert_allclose(float(same), float(base), rtol=1e-5)
    b16 = losses.info_nce_loss(jnp.asarray(q), jnp.asarray(r), valid, tau=0.1,
                               compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(float(b16), float(base), rtol=2e-2)

    g_base = jax.grad(
        lambda a, b: losses.info_nce_loss(a, b, valid, tau=0.1)
    )(jnp.asarray(q), jnp.asarray(r))
    g_b16 = jax.grad(
        lambda a, b: losses.info_nce_loss(a, b, valid, tau=0.1,
                                          compute_dtype=jnp.bfloat16)
    )(jnp.asarray(q), jnp.asarray(r))
    # gradient direction preserved (cosine similarity, not elementwise)
    ga, gb = np.asarray(g_base).ravel(), np.asarray(g_b16).ravel()
    cos = ga @ gb / (np.linalg.norm(ga) * np.linalg.norm(gb) + 1e-12)
    assert cos > 0.999, cos


def test_train_forward_knobs_smoke():
    """fuse_ist_pair + nce_dtype + norm_dtype: the flagged train forward runs,
    is finite, and stays close to the default path (BN joint stats and bf16
    rounding are the only deviations)."""
    from gigapose_tpu.models.ae_net import AENet
    from gigapose_tpu.models.ist_net import ISTBackbone, ISTNet, Regressor
    from gigapose_tpu.training.state import (
        OptimConfig, TrainBatch, compute_losses, create_train_state,
    )

    def nets(norm_dtype=None):
        ae = AENet(model_name="vit_tiny_test")
        ist = ISTNet(
            backbone=ISTBackbone(initial_dim=8, block_dims=(8, 8, 12, 16),
                                 descriptor_size=16, input_size=256,
                                 norm_dtype=norm_dtype),
            regressor=Regressor(hidden_dim=16),
        )
        return ae, ist

    B, P = 2, 16
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 4, size=(B, P, 2)).astype(np.float32)
    batch = TrainBatch(
        src_img=jnp.asarray(rng.normal(size=(B, 3, 224, 224)), jnp.float32),
        tar_img=jnp.asarray(rng.normal(size=(B, 3, 224, 224)), jnp.float32),
        src_pts=jnp.asarray(pts), tar_pts=jnp.asarray(pts),
        rel_scale=jnp.ones((B,), jnp.float32),
        rel_inplane=jnp.zeros((B,), jnp.float32),
    )

    def loss_with(cfg, norm_dtype=None):
        ae, ist = nets(norm_dtype)
        state, _ = create_train_state(ae, ist, jax.random.PRNGKey(0), cfg)
        params = {"ae": state.ae_params, "ist": state.ist_params}
        total, (metrics, new_stats) = compute_losses(
            ae, ist, params, state.ist_batch_stats, batch, state.step, cfg)
        return float(total), metrics, new_stats

    base, m0, _ = loss_with(OptimConfig())
    fused, m1, stats1 = loss_with(OptimConfig(fuse_ist_pair=True))
    assert np.isfinite(fused)
    # fused BN stats still update (mutable path through method=features)
    assert jax.tree_util.tree_leaves(stats1)
    np.testing.assert_allclose(fused, base, rtol=0.15)  # joint-vs-split stats
    b16, _, _ = loss_with(OptimConfig(nce_dtype="bf16"))
    np.testing.assert_allclose(b16, base, rtol=2e-2)
    bn16, _, _ = loss_with(OptimConfig(), norm_dtype="bfloat16")
    np.testing.assert_allclose(bn16, base, rtol=5e-2)


def test_scale_inplane_losses():
    rng = np.random.default_rng(4)
    pred = jnp.asarray(rng.uniform(0.5, 2, 10), jnp.float32)
    gt = jnp.asarray(rng.uniform(0.5, 2, 10), jnp.float32)
    valid = jnp.ones(10, bool)
    l = losses.scale_loss(pred, gt, valid, log=True)
    want = np.mean((np.log(np.asarray(pred)) - np.log(np.asarray(gt))) ** 2)
    np.testing.assert_allclose(float(l), want, rtol=1e-4)

    ang_p = rng.uniform(0, 2 * np.pi, 10)
    ang_g = ang_p + 0.1
    cs_p = jnp.asarray(np.stack([np.cos(ang_p), np.sin(ang_p)], -1), jnp.float32)
    cs_g = jnp.asarray(np.stack([np.cos(ang_g), np.sin(ang_g)], -1), jnp.float32)
    li = losses.inplane_loss(cs_p, cs_g, valid)
    np.testing.assert_allclose(float(li), 0.1, atol=1e-3)


def test_vit_remat_equals_plain():
    """remat=True (per-block jax.checkpoint, the train-batch memory lever)
    must be numerically identical in both the forward and the gradient."""
    import jax

    from gigapose_tpu.models.ae_net import AENet

    ae = AENet(model_name="vit_tiny_test")
    ae_r = AENet(model_name="vit_tiny_test", remat=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 56, 56)),
                    jnp.float32)
    p = ae.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(ae.apply(p, x)), np.asarray(ae_r.apply(p, x)), atol=1e-6
    )
    loss = lambda net: lambda p: jnp.sum(net.apply(p, x) ** 2)
    g1 = jax.grad(loss(ae))(p)
    g2 = jax.grad(loss(ae_r))(p)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5),
        g1, g2,
    )
