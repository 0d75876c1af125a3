"""W8A8 quantized matmul kernels + int8 ViT serving forward.

CPU strategy: the fake-quant XLA reference (qmm_ref/qmm_mlp_ref) is the
semantic oracle; the Pallas kernels are checked against it in interpreter
mode; the int8 ViT forward is checked against the f32 flax ViT for feature
fidelity (the quantization error bound) and against its own ref backend for
kernel equality. The real-chip compile + speed numbers live in bench.py
(GIGAPOSE_BENCH_INT8) and ROUND_NOTES."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigapose_tpu.models.vit import VIT_CONFIGS, ViT
from gigapose_tpu.models.vit_int8 import (
    AENetInt8,
    prepare_int8_params,
    vit_forward_int8,
)
from gigapose_tpu.ops import qmm as Q


def _mk(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)


def test_quantize_weight_roundtrip():
    w = _mk((64, 96), 1, 0.05)
    wq, ws = Q.quantize_weight(w)
    assert wq.dtype == jnp.int8 and ws.shape == (1, 96)
    deq = np.asarray(wq, np.float32) * np.asarray(ws)
    err = np.abs(deq - np.asarray(w))
    # symmetric per-column: error bounded by half a quantization step
    assert (err <= np.asarray(ws) / 2 + 1e-8).all()
    # extreme magnitudes map to +-127
    assert np.abs(np.asarray(wq)).max() == 127


@pytest.mark.parametrize("ln", [False, True])
@pytest.mark.parametrize("res", [False, True])
def test_qmm_interpret_matches_ref(ln, res):
    T, K, N = 48, 64, 96  # T not a multiple of block_t: divisor fallback
    x = _mk((T, K), 2)
    wq, ws = Q.quantize_weight(_mk((K, N), 3, 0.05))
    b = _mk((1, N), 4, 0.1)
    g = jnp.abs(_mk((1, K), 5)) + 0.5 if ln else None
    be = _mk((1, K), 6, 0.2) if ln else None
    r = _mk((T, N), 14) if res else None
    ls = _mk((1, N), 15, 0.1) if res else None
    ref = Q.qmm_ref(x, wq, ws, b, g, be, r, ls)
    out = Q.qmm(x, wq, ws, b, g, be, r, ls, block_t=32, interpret=True)
    assert out.shape == (T, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_qmm_mlp_interpret_matches_ref():
    T, C, Hd = 40, 64, 256
    x = _mk((T, C), 7)
    w1q, w1s = Q.quantize_weight(_mk((C, Hd), 8, 0.05))
    b1 = _mk((1, Hd), 9, 0.1)
    w2q, w2s = Q.quantize_weight(_mk((Hd, C), 10, 0.05))
    b2 = _mk((1, C), 11, 0.1)
    g = jnp.abs(_mk((1, C), 12)) + 0.5
    be = _mk((1, C), 13, 0.2)
    ls = _mk((1, C), 16, 0.1)
    ref = Q.qmm_mlp_ref(x, w1q, w1s, b1, w2q, w2s, b2, g, be, ls)
    out = Q.qmm_mlp(x, w1q, w1s, b1, w2q, w2s, b2, g, be, ls,
                    block_t=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def tiny_vit():
    cfg = VIT_CONFIGS["vit_tiny_test"]
    model = ViT(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (2, 3, 224, 224)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), images)
    return cfg, model, variables, images


def test_int8_vit_feature_fidelity(tiny_vit):
    """The int8 forward's features stay close to the f32 flax forward —
    the same gate the bf16 store/compute defaults shipped under
    (test_precision_and_weights: cos > 0.99)."""
    cfg, model, variables, images = tiny_vit
    ref = model.apply(variables, images)["x_prenorm"]
    qp = prepare_int8_params(variables, cfg)
    out = vit_forward_int8(qp, images, cfg, backend="ref")["x_prenorm"]
    a = np.asarray(ref).reshape(-1, cfg.embed_dim)
    b = np.asarray(out).reshape(-1, cfg.embed_dim)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert cos.min() > 0.99, cos.min()


def test_int8_vit_backends_agree(tiny_vit):
    """Pallas kernels (interpret mode) == fake-quant XLA reference through
    the full network."""
    cfg, model, variables, images = tiny_vit
    qp = prepare_int8_params(variables, cfg)
    ref = vit_forward_int8(qp, images, cfg, backend="ref")
    out = vit_forward_int8(qp, images, cfg, backend="interpret")
    np.testing.assert_allclose(
        np.asarray(out["x_prenorm"]), np.asarray(ref["x_prenorm"]),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["x_norm"]), np.asarray(ref["x_norm"]),
        rtol=1e-3, atol=2e-3,
    )


def test_ae_net_int8_contract(tiny_vit):
    from gigapose_tpu.models.ae_net import AENet

    cfg, model, variables, images = tiny_vit
    ae = AENet(model_name="vit_tiny_test")
    ae_vars = ae.init(jax.random.PRNGKey(1), images)
    ref = ae.apply(ae_vars, images)  # (B, P, C) L2-normalized
    q = AENetInt8.from_ae_net(ae, ae_vars, backend="ref")
    out = q.apply(q.params, images)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5
    )
    cos = (np.asarray(out) * np.asarray(ref)).sum(-1)
    assert cos.min() > 0.99  # quantization-level agreement with f32 AENet


def test_prepare_rejects_swiglu():
    cfg = VIT_CONFIGS["vit_tiny_swiglu_test"]
    model = ViT(cfg)
    images = jnp.zeros((1, 3, 224, 224), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images)
    with pytest.raises(NotImplementedError):
        prepare_int8_params(variables, cfg)


def test_qmm_attn_block_interpret_matches_ref():
    B, Np, C, H = 2, 24, 64, 2
    T = B * Np
    x = _mk((T, C), 20)
    qwq, qws = Q.quantize_weight(_mk((C, 3 * C), 21, 0.05))
    qb = _mk((1, 3 * C), 22, 0.1)
    pwq, pws = Q.quantize_weight(_mk((C, C), 23, 0.05))
    pb = _mk((1, C), 24, 0.1)
    g = jnp.abs(_mk((1, C), 25)) + 0.5
    be = _mk((1, C), 26, 0.2)
    ls = _mk((1, C), 27, 0.1)
    # mask the last 4 "tokens" of each element like the padded serving path
    kb = jnp.where(jnp.arange(Np) < Np - 4, 0.0, -1e9).reshape(1, Np)
    ref = Q.qmm_attn_block_ref(x, qwq, qws, qb, pwq, pws, pb, g, be, ls, kb,
                               batch=B, num_heads=H)
    out = Q.qmm_attn_block(x, qwq, qws, qb, pwq, pws, pb, g, be, ls, kb,
                           batch=B, num_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_quantized_estimator_pipeline_equivalence():
    """quantize_serving swaps the AE net inside the full coarse pipeline;
    retrieval and poses must match the f32 estimator at quantization-level
    tolerance (same random tiny nets, same batch)."""
    import copy

    from gigapose_tpu.models.ist_net import ISTBackbone, ISTNet, Regressor
    from gigapose_tpu.pipeline.estimator import (
        DetectionBatch, EstimatorConfig, GigaPoseEstimator,
    )
    from gigapose_tpu.pipeline.templates import TemplateStore
    from gigapose_tpu.models.ae_net import AENet

    rng = np.random.default_rng(3)
    B, V, P, C, C_ist = 3, 6, 256, 64, 32
    ae = AENet(model_name="vit_tiny_test")
    ist = ISTNet(
        backbone=ISTBackbone(initial_dim=16, block_dims=(16, 16, 24, 32),
                             descriptor_size=C_ist, input_size=256),
        regressor=Regressor(hidden_dim=32),
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    d224 = jnp.zeros((1, 3, 224, 224), jnp.float32)
    dpts = jnp.zeros((1, 4, 2), jnp.float32)
    est = GigaPoseEstimator(
        ae_net=ae, ist_net=ist, ae_params=ae.init(k1, d224),
        ist_vars=ist.init(k2, d224, d224, dpts, dpts),
        config=EstimatorConfig(k=2),
    )
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    K = jnp.asarray([[572.4, 0, 320], [0, 573.6, 240], [0, 0, 1.0]])
    store = TemplateStore(
        ae_features=f(1, V, P, C), ist_features=f(1, V, P, C_ist),
        masks=jnp.ones((1, V, P), jnp.float32),
        Ms=jnp.tile(jnp.eye(3), (1, V, 1, 1)),
        poses=jnp.tile(jnp.eye(4), (1, V, 1, 1)).at[:, :, 2, 3].set(400.0),
        K=K[None],
    )
    batch = DetectionBatch(
        crops=f(B, 3, 224, 224), masks=jnp.ones((B, P), jnp.float32),
        labels=jnp.zeros((B,), jnp.int32),
        Ks=jnp.tile(K[None], (B, 1, 1)), Ms=jnp.tile(jnp.eye(3)[None], (B, 1, 1)),
        valid=jnp.ones((B,), bool),
    )
    # store must come from the same extractor in both runs: onboard-equal
    # features, so only the QUERY path differs (worst case for mismatch)
    ref = est(store, batch)
    q_est = copy.copy(est).quantize_serving(backend="ref")
    assert type(q_est.ae_net).__name__ == "AENetInt8"
    out = q_est(store, batch)
    np.testing.assert_array_equal(np.asarray(out.view_ids),
                                  np.asarray(ref.view_ids))
    np.testing.assert_allclose(np.asarray(out.sim_scores),
                               np.asarray(ref.sim_scores), atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.poses),
                               np.asarray(ref.poses), atol=2.0)  # mm-scale
