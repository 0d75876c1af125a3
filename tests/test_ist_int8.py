"""int8 IST backbone serving path (models/ist_int8).

Mirrors the vit_int8/qmm test strategy: the "ref" backend computes the
EXACT same quantized math in f32 on CPU, so fidelity and backend-equality
are testable without a TPU; the "int8" backend (real int8 operands,
int32 accumulation) must agree bit-for-bit in the dequantized output since
both accumulations are exact for these operand sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigapose_tpu.models.ist_net import ISTBackbone, ISTNet, Regressor
from gigapose_tpu.models.ist_int8 import (
    ISTNetInt8, attach_static_act_scales, ist_act_absmax, ist_features_int8,
    prepare_int8_ist_params,
)


def _tiny_ist(seed=0):
    net = ISTNet(
        backbone=ISTBackbone(initial_dim=16, block_dims=(16, 16, 24, 32),
                             descriptor_size=32, input_size=256),
        regressor=Regressor(hidden_dim=32),
    )
    d = jnp.zeros((1, 3, 224, 224), jnp.float32)
    pts = jnp.zeros((1, 4, 2), jnp.float32)
    ist_vars = net.init(jax.random.PRNGKey(seed), d, d, pts, pts)
    return net, ist_vars


def test_int8_ist_features_close_to_flax():
    net, ist_vars = _tiny_ist()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 224, 224)), jnp.float32)
    ref = net.apply(ist_vars, x, method=net.features)
    qp = prepare_int8_ist_params(ist_vars, net.backbone)
    got = ist_features_int8(qp, x, input_size=256, backend="ref")
    assert got.shape == ref.shape == (2, 256, 32)
    # cosine per patch descriptor: int8 conv quantization noise compounds
    # over 9 convs + out_conv; per-channel weight scales keep it tight
    cos = jnp.sum(got * ref, -1) / (
        jnp.linalg.norm(got, axis=-1) * jnp.linalg.norm(ref, axis=-1) + 1e-9
    )
    assert float(cos.mean()) > 0.995, float(cos.mean())
    assert float(cos.min()) > 0.97, float(cos.min())


def test_int8_backend_matches_ref_backend():
    """Real int8 operands (int32 accum) vs the f32 fake-quant reference:
    both are exact accumulations of the same integers -> equal outputs."""
    net, ist_vars = _tiny_ist(seed=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 3, 224, 224)), jnp.float32)
    qp = prepare_int8_ist_params(ist_vars, net.backbone)
    a = ist_features_int8(qp, x, 256, backend="ref")
    b = ist_features_int8(qp, x, 256, backend="int8")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-4)


def test_int8_ist_wrapper_dispatch():
    """ISTNetInt8.apply dispatches features to the int8 path and regress to
    the wrapped flax net, through the estimator's calling convention."""
    net, ist_vars = _tiny_ist(seed=2)
    q = ISTNetInt8.from_ist_net(net, ist_vars, backend="ref")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 3, 224, 224)), jnp.float32)
    feats = q.apply(q.variables, x, method=q.features)
    assert feats.shape == (1, 256, 32)
    pts = jnp.asarray(rng.integers(0, 16, size=(1, 8, 2)), jnp.float32)
    res = q.apply(q.variables, feats, feats, pts, pts, method=q.regress)
    res_flax = net.apply(ist_vars, feats, feats, pts, pts, method=net.regress)
    np.testing.assert_allclose(
        np.asarray(res.scale), np.asarray(res_flax.scale), rtol=1e-5
    )
    # BN fold requires inference mode
    with pytest.raises(NotImplementedError):
        q.apply(q.variables, x, method=q.features, train=True)


def test_static_scales_match_dynamic_on_calibration_input():
    """Static activation scales calibrated on the same single image MUST
    reproduce the dynamic path exactly: at B=1 the dynamic per-image absmax
    and the calibration absmax are the same number, every intermediate is
    identical, so the outputs agree to float noise."""
    net, ist_vars = _tiny_ist(seed=4)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 3, 224, 224)), jnp.float32)
    qp = prepare_int8_ist_params(ist_vars, net.backbone)
    dyn = ist_features_int8(qp, x, 256, backend="ref")
    absmaxes = ist_act_absmax(qp, x, 256, backend="ref")
    qp_s = attach_static_act_scales(qp, absmaxes, margin=1.0)
    sta = ist_features_int8(qp_s, x, 256, backend="ref")
    np.testing.assert_allclose(np.asarray(sta), np.asarray(dyn), atol=1e-6)


def test_static_scales_close_to_flax_on_held_out_inputs():
    """Calibrate on one batch, serve another: the static path must stay
    close to the f32 flax features (the int8 fidelity contract) despite the
    held-out batch's absmax not being the calibration one; margin=1.1
    leaves clip headroom."""
    net, ist_vars = _tiny_ist(seed=5)
    rng = np.random.default_rng(5)
    calib = jnp.asarray(rng.normal(size=(2, 3, 224, 224)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 3, 224, 224)), jnp.float32)
    qp = prepare_int8_ist_params(ist_vars, net.backbone)
    qp_s = attach_static_act_scales(
        qp, ist_act_absmax(qp, calib, 256, backend="ref"), margin=1.1
    )
    ref = net.apply(ist_vars, x, method=net.features)
    got = ist_features_int8(qp_s, x, 256, backend="ref")
    cos = jnp.sum(got * ref, -1) / (
        jnp.linalg.norm(got, axis=-1) * jnp.linalg.norm(ref, axis=-1) + 1e-9
    )
    assert float(cos.mean()) > 0.99, float(cos.mean())
    assert float(cos.min()) > 0.95, float(cos.min())


def test_attach_static_scales_order_and_exhaustion():
    """The calibration list length must exactly match the tree's conv count
    (the zip is positional — a silent mismatch would misassign scales)."""
    net, ist_vars = _tiny_ist(seed=6)
    qp = prepare_int8_ist_params(ist_vars, net.backbone)
    x = jnp.zeros((1, 3, 224, 224), jnp.float32)
    absmaxes = ist_act_absmax(qp, x, 256, backend="ref")
    # conv1 + 8 block convs (2 per block x 4 stages x 2 blocks) + 3 down
    # convs (stages 2-4 stride) + out_conv
    n_down = sum(1 for blk in qp["layers"] if "down" in blk)
    assert len(absmaxes) == 1 + 2 * len(qp["layers"]) + n_down + 1
    with pytest.raises(ValueError):
        attach_static_act_scales(qp, absmaxes + [1.0])
    with pytest.raises(StopIteration):
        attach_static_act_scales(qp, absmaxes[:-1])


def test_calibrate_wrapper():
    """ISTNetInt8.calibrate switches to static scales in place and the
    features dispatch still runs (jit retraces on the new pytree)."""
    net, ist_vars = _tiny_ist(seed=7)
    q = ISTNetInt8.from_ist_net(net, ist_vars, backend="ref")
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 3, 224, 224)), jnp.float32)
    before = q.apply(q.variables, x, method=q.features)
    q.calibrate(x, margin=1.0)
    assert "sa" in q.variables["q"]["conv1"]
    after = q.apply(q.variables, x, method=q.features)
    np.testing.assert_allclose(
        np.asarray(after), np.asarray(before), atol=1e-6
    )


def test_onboard_calibrates_static_ist_scales(tmp_path):
    """quantize_serving(ist="static") + CoarseRunner.onboard: calibration on
    the first object's template crops happens BEFORE feature extraction, the
    estimator's ist_vars are re-fetched (the calibrated pytree has a new
    structure), the onboarded store is finite, and the cache tag separates
    the static namespace from the dynamic one."""
    import os

    from tests import synthetic_bop
    import test as test_cli
    from gigapose_tpu.pipeline.runner import CoarseRunner
    from gigapose_tpu.utils.config import load_config

    root = synthetic_bop.build(str(tmp_path))
    cfg = load_config("test", ["test_dataset_name=tudl"])
    est = test_cli.build_estimator(cfg, tiny=True)
    est.quantize_serving(backend="ref", ist="static")
    assert est.ist_net.static_pending
    # the cache tag must namespace static-scale stores apart from dynamic
    cfg_tag = load_config(
        "test", ["test_dataset_name=tudl", "onboarding_cache=tiny"]
    )
    assert test_cli._cache_tag(cfg_tag, est).endswith("-int8ists")

    tdir = os.path.join(root, "datasets", "templates", "tudl")
    runner = CoarseRunner.onboard(
        est, template_dir=tdir, save_dir=str(tmp_path / "r"),
        dataset_name="tudl", num_templates=8,
    )
    assert not est.ist_net.static_pending
    assert "sa" in est.ist_net.variables["q"]["conv1"]
    # the estimator must hold the CALIBRATED tree (quantize_serving's
    # re-fetch contract), not the stale pre-calibration one
    assert "sa" in est.ist_vars["q"]["conv1"]
    assert np.isfinite(np.asarray(runner.store.ist_features)).all()
    # a second onboard is a no-op calibration (already calibrated)
    CoarseRunner.onboard(
        est, template_dir=tdir, save_dir=str(tmp_path / "r2"),
        dataset_name="tudl", num_templates=8,
    )


def test_estimator_pipeline_with_int8_ist():
    """quantize_serving(ist=True) end to end: the coarse pipeline runs and
    its retrieval/poses stay consistent with the float pipeline on the same
    planted store (same tolerance style as test_qmm's pipeline test)."""
    from gigapose_tpu.models.ae_net import AENet
    from gigapose_tpu.pipeline.estimator import (
        DetectionBatch, EstimatorConfig, GigaPoseEstimator,
    )
    from gigapose_tpu.pipeline.templates import TemplateStore

    net, ist_vars = _tiny_ist(seed=3)
    ae = AENet(model_name="vit_tiny_test")
    k = jax.random.PRNGKey(3)
    ae_params = ae.init(k, jnp.zeros((1, 3, 224, 224)))
    cfg = EstimatorConfig(k=2)
    est_f = GigaPoseEstimator(ae_net=ae, ist_net=net, ae_params=ae_params,
                              ist_vars=ist_vars, config=cfg)
    est_q = GigaPoseEstimator(ae_net=ae, ist_net=net, ae_params=ae_params,
                              ist_vars=ist_vars, config=cfg)
    est_q.quantize_serving(backend="ref", ist=True)

    rng = np.random.default_rng(0)
    B, V, P, C = 2, 5, 256, 64
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    store = TemplateStore(
        ae_features=f(1, V, P, C),
        ist_features=f(1, V, P, 32),
        masks=jnp.ones((1, V, P), jnp.float32),
        Ms=jnp.tile(jnp.eye(3), (1, V, 1, 1)),
        poses=jnp.tile(jnp.eye(4), (1, V, 1, 1)).at[:, :, 2, 3].set(400.0),
        K=jnp.tile(jnp.asarray(
            [[572.0, 0, 320], [0, 573.0, 240], [0, 0, 1.0]]), (1, 1, 1)),
    )
    batch = DetectionBatch(
        crops=f(B, 3, 224, 224),
        masks=jnp.ones((B, P), jnp.float32),
        labels=jnp.zeros((B,), jnp.int32),
        Ks=jnp.tile(store.K[0][None], (B, 1, 1)),
        Ms=jnp.tile(jnp.eye(3)[None], (B, 1, 1)),
        valid=jnp.ones((B,), bool),
    )
    pred_f = est_f(store, batch)
    pred_q = est_q(store, batch)
    # retrieval is AE-driven and the AE int8 path is already oracled in
    # test_qmm; here assert the int8-IST pipeline retrieves the same views
    np.testing.assert_array_equal(
        np.asarray(pred_f.view_ids), np.asarray(pred_q.view_ids)
    )
    assert np.isfinite(np.asarray(pred_q.poses)).all()
