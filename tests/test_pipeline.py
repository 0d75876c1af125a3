"""End-to-end pipeline tests.

1. pure-ops E2E: synthetic feature world with GT regression values planted —
   retrieval, RANSAC, and recovery must reproduce the constructed pose chain.
2. net-driven smoke: tiny nets, query == template v -> retrieval must return v
   and the whole jitted pipeline must produce finite outputs.
3. sharded smoke: same pipeline under a dp mesh on 8 virtual CPU devices.
4. train_step smoke: one optimizer step decreases nothing but must run, update
   params, and keep shapes — incl. under the dp mesh (the dryrun path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigapose_tpu.models.ae_net import AENet
from gigapose_tpu.models.ist_net import ISTBackbone, ISTNet, Regressor
from gigapose_tpu.ops.matching import match_templates
from gigapose_tpu.ops.ransac import ransac_affine
from gigapose_tpu.ops.pose_recovery import recover_poses
from gigapose_tpu.pipeline.estimator import (
    DetectionBatch,
    EstimatorConfig,
    GigaPoseEstimator,
    coarse_forward,
)
from gigapose_tpu.pipeline.templates import TemplateStore


def tiny_estimator(k=2, npat=4):
    ae = AENet(model_name="vit_tiny_test")
    ist = ISTNet(
        backbone=ISTBackbone(
            initial_dim=16, block_dims=(16, 16, 24, 32), descriptor_size=32,
            input_size=64,
        ),
        regressor=Regressor(hidden_dim=32),
    )
    cfg = EstimatorConfig(k=k, num_patches=npat, patch_size=14)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    dummy = jnp.zeros((1, 3, 56, 56), jnp.float32)
    dpts = jnp.zeros((1, 4, 2), jnp.float32)
    return GigaPoseEstimator(
        ae_net=ae,
        ist_net=ist,
        ae_params=ae.init(k1, dummy),
        ist_vars=ist.init(k2, jnp.zeros((1, 3, 64, 64)), jnp.zeros((1, 3, 64, 64)), dpts, dpts),
        config=cfg,
    )


def _store_from_features(ae_f, ist_f, masks, Ms, poses, K):
    return TemplateStore(
        ae_features=ae_f, ist_features=ist_f, masks=masks, Ms=Ms, poses=poses, K=K
    )


def test_ops_e2e_planted_world():
    """Construct a world where template v's patches map to the query by a known
    similarity (scale s, angle a, translation t). Matching retrieves v, RANSAC
    recovers [sR|t], recovery reproduces the analytic pose."""
    rng = np.random.default_rng(0)
    npat, P, C, V, B = 4, 16, 24, 6, 2
    patch = 14

    # distinctive template features; query copies template v's features at
    # permuted patch positions given by the planted affine
    src_feats = rng.normal(size=(B, V, P, C)).astype(np.float32)
    v_star = np.array([2, 4])
    s_star, a_star = 1.25, 0.35
    R = np.array([[np.cos(a_star), -np.sin(a_star)], [np.sin(a_star), np.cos(a_star)]])
    t_star = np.array([5.0, -3.0])  # pixels

    grid = np.stack(np.meshgrid(np.arange(npat), np.arange(npat), indexing="xy"), -1)
    grid = grid.reshape(P, 2).astype(np.float64)  # (P, 2) [x, y] patch coords

    tar_feats = np.zeros((B, P, C), np.float32)
    # map each template patch to its query location; fill query feature grid
    corr = {}
    for b in range(B):
        corr[b] = {}
        for p in range(P):
            q = (s_star * R @ (grid[p] * patch) + t_star) / patch
            qi = np.round(q).astype(int)
            if 0 <= qi[0] < npat and 0 <= qi[1] < npat:
                qidx = qi[1] * npat + qi[0]
                tar_feats[b, qidx] = src_feats[b, v_star[b], p]
                corr[b][qidx] = p
    tar_mask = (np.abs(tar_feats).sum(-1) > 0).astype(np.float32)
    src_mask = np.ones((B, V, P), np.float32)

    match = match_templates(
        jnp.asarray(tar_feats), jnp.asarray(src_feats),
        jnp.asarray(tar_mask), jnp.asarray(src_mask),
        k=2, sim_threshold=0.5, patch_threshold=1, num_patches=npat,
    )
    assert np.all(np.asarray(match.ids[:, 0]) == v_star)

    # plant GT regression values and run RANSAC on the top-1 correspondences
    B_, k_, P_ = match.valid.shape
    rel_scale = jnp.full((B_, k_, P_), s_star, jnp.float32)
    cossin = jnp.broadcast_to(
        jnp.asarray([np.cos(a_star), np.sin(a_star)], jnp.float32), (B_, k_, P_, 2)
    )
    rr = ransac_affine(
        match.src_pts, match.tar_pts, match.score_pts, rel_scale, cossin,
        match.valid, pixel_threshold=2.0, patch_size=patch,
    )
    want_lin = s_star * R
    for b in range(B):
        np.testing.assert_allclose(np.asarray(rr.M[b, 0, :2, :2]), want_lin, atol=1e-3)
        # translation is recovered up to patch quantization of the planted map
        np.testing.assert_allclose(
            np.asarray(rr.M[b, 0, :2, 2]), t_star, atol=patch * 0.75
        )

    # recovery: an identity query crop and template crop makes the affine
    # chain equal rr.M; check depth scaling z_q = z_t / s * f_ratio
    eye3 = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    K_q = np.tile(np.array([[600.0, 0, 32], [0, 600.0, 32], [0, 0, 1]], np.float32), (B, 1, 1))
    K_t = np.tile(np.array([[500.0, 0, 32], [0, 500.0, 32], [0, 0, 1]], np.float32), (B, 1, 1))
    temp_Ms = np.tile(np.eye(3, dtype=np.float32), (B, V, 1, 1))
    temp_poses = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    temp_poses[..., 2, 3] = 0.4
    poses = recover_poses(
        jnp.asarray(eye3), jnp.asarray(K_q), match.ids[:, :1], rr.M[:, :1],
        jnp.asarray(K_t), jnp.asarray(temp_Ms), jnp.asarray(temp_poses),
    )
    got_z = np.asarray(poses[:, 0, 2, 3])
    want_z = 0.4 / s_star * (600.0 / 500.0)
    np.testing.assert_allclose(got_z, want_z, rtol=0.02)
    # in-plane rotation of recovered pose = R (template pose is identity)
    np.testing.assert_allclose(np.asarray(poses[0, 0, :2, :2]), R, atol=5e-3)


def _net_driven_world(est, B=2, V=5, npat=4):
    rng = np.random.default_rng(1)
    P = npat * npat
    templates = rng.uniform(size=(V, 3, 56, 56)).astype(np.float32)
    v_star = 3
    crops = np.stack([templates[v_star]] * B)
    store_ae = est.ae_apply(jnp.asarray(templates))[None].repeat(1, 0)  # (1, V, P, C)
    # ist features for 64-input backbone: resize handled inside; reuse crops
    ist_in = jnp.asarray(np.pad(templates, ((0, 0), (0, 0), (0, 4), (0, 4))))[:, :, :64, :64]
    store_ist = est.ist_apply(ist_in)[None]
    masks = jnp.ones((1, V, P), jnp.float32)
    Ms = jnp.tile(jnp.eye(3), (1, V, 1, 1))
    poses = jnp.tile(jnp.eye(4), (1, V, 1, 1)).at[:, :, 2, 3].set(0.4)
    K = jnp.asarray(np.tile(np.array([[500.0, 0, 32], [0, 500, 32], [0, 0, 1]]), (1, 1, 1)))
    store = _store_from_features(store_ae, store_ist, masks, Ms, poses, K)
    batch = DetectionBatch(
        crops=jnp.asarray(crops),
        masks=jnp.ones((B, P), jnp.float32),
        labels=jnp.zeros((B,), jnp.int32),
        Ks=jnp.tile(K[0][None], (B, 1, 1)),
        Ms=jnp.tile(jnp.eye(3)[None], (B, 1, 1)),
        valid=jnp.ones((B,), bool),
    )
    return store, batch, v_star


def test_net_driven_pipeline_smoke():
    est = tiny_estimator()
    store, batch, v_star = _net_driven_world(est)
    # NOTE: ae crops are 56x56 (4x4 grid) but ist backbone expects its own
    # input; the tiny ist net resizes internally, so reuse the same crops.
    pred = coarse_forward(
        est.ae_net, est.ist_net, est.ae_params, est.ist_vars, store,
        DetectionBatch(
            crops=batch.crops, masks=batch.masks, labels=batch.labels,
            Ks=batch.Ks, Ms=batch.Ms, valid=batch.valid,
        ),
        cfg=est.config,
    )
    # query is exactly template v_star -> retrieval must surface it with a
    # near-perfect patch similarity (hypotheses are later re-ranked by RANSAC
    # inliers, and with an untrained IST net the order after that is arbitrary)
    ids = np.asarray(pred.view_ids)
    sims = np.asarray(pred.sim_scores)
    for b in range(ids.shape[0]):
        assert v_star in ids[b]
        assert sims[b, ids[b] == v_star][0] > 0.9
    for f in pred:
        assert np.all(np.isfinite(np.asarray(f, dtype=np.float32)))


def test_pipeline_jit_and_shard():
    from jax.sharding import NamedSharding, PartitionSpec as Pspec
    from gigapose_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    est = tiny_estimator()
    store, batch, _ = _net_driven_world(est, B=8)
    mesh = make_mesh(8)
    store_r = replicate(store, mesh)
    params_r = replicate((est.ae_params, est.ist_vars), mesh)
    batch_s = shard_batch(batch, mesh)
    fn = jax.jit(
        lambda ae_p, ist_v, s, b: coarse_forward(
            est.ae_net, est.ist_net, ae_p, ist_v, s, b, cfg=est.config
        )
    )
    pred = fn(params_r[0], params_r[1], store_r, batch_s)
    assert pred.poses.shape == (8, est.config.k, 4, 4)
    assert np.all(np.isfinite(np.asarray(pred.poses)))


def test_train_step_runs_and_updates():
    from gigapose_tpu.training.state import (
        OptimConfig,
        TrainBatch,
        create_train_state,
        train_step,
    )
    from functools import partial

    ae = AENet(model_name="vit_tiny_test")
    ist = ISTNet(
        backbone=ISTBackbone(
            initial_dim=8, block_dims=(8, 8, 12, 16), descriptor_size=16,
            input_size=64,
        ),
        regressor=Regressor(hidden_dim=16),
    )
    cfg = OptimConfig(warm_up_steps=2)
    state, tx = create_train_state(ae, ist, jax.random.PRNGKey(0), cfg, image_size=56)
    rng = np.random.default_rng(2)
    B, P = 2, 16
    batch = TrainBatch(
        src_img=jnp.asarray(rng.normal(size=(B, 3, 56, 56)), jnp.float32),
        tar_img=jnp.asarray(rng.normal(size=(B, 3, 56, 56)), jnp.float32),
        src_pts=jnp.asarray(rng.integers(-1, 4, (B, P, 2)), jnp.float32),
        tar_pts=jnp.asarray(rng.integers(-1, 4, (B, P, 2)), jnp.float32),
        rel_scale=jnp.ones((B,), jnp.float32) * 1.2,
        rel_inplane=jnp.ones((B,), jnp.float32) * 0.3,
    )
    step = jax.jit(partial(train_step, ae, ist, tx, cfg))
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["total"]))
    # step 0 has lr=0 (linear warm-up from zero, like the reference); params
    # must move after the second step when the lr is non-zero
    new_state2, _ = step(new_state, batch)
    assert int(new_state2.step) == 2
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), new_state.ae_params,
        new_state2.ae_params,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_pipeline_with_pallas_matching():
    """coarse_forward with use_pallas_matching=True (auto-interpret off-TPU)
    produces the same retrieval as the XLA path."""
    import dataclasses

    est = tiny_estimator()
    store, batch, v_star = _net_driven_world(est)
    cfg_p = dataclasses.replace(est.config, use_pallas_matching=True)
    pred_x = coarse_forward(
        est.ae_net, est.ist_net, est.ae_params, est.ist_vars, store, batch,
        cfg=est.config,
    )
    pred_p = coarse_forward(
        est.ae_net, est.ist_net, est.ae_params, est.ist_vars, store, batch,
        cfg=cfg_p,
    )
    np.testing.assert_array_equal(
        np.asarray(pred_x.view_ids), np.asarray(pred_p.view_ids)
    )
    np.testing.assert_allclose(
        np.asarray(pred_x.poses), np.asarray(pred_p.poses), atol=1e-4
    )


def test_onboard_params_are_runtime_args():
    """(pure_fn, params) onboarding: weights enter the fused per-object
    program as RUNTIME ARGUMENTS, not jaxpr constants. The legacy closure
    form baked the extractor weights into the compiled module — at ViT-L
    int8 that is ~300 MB of constants, which the axon relay's
    remote-compile endpoint rejects outright (HTTP 413, ROUND_NOTES r5).
    Pins (a) pair == closure numerics, (b) two param sets reuse ONE cached
    program (proof the params are arguments: a constant-baked program could
    not serve different weights without retracing)."""
    from gigapose_tpu.pipeline import templates as T

    V, H, C = 4, 32, 8
    rng = np.random.default_rng(0)
    rgbas = rng.uniform(size=(V, 4, H, H)).astype(np.float32)
    rgbas[:, 3] = 1.0
    poses = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))

    def fn(p, x):  # (B, 3, 32, 32) -> (B, 16, C), params-dependent
        B = x.shape[0]
        pooled = x.reshape(B, 3, 4, 8, 4, 8).mean(axis=(3, 5))  # (B, 3, 4, 4)
        feat = pooled.reshape(B, 3, 16).transpose(0, 2, 1)  # (B, 16, 3)
        return feat @ p

    p1 = jnp.asarray(rng.normal(size=(3, C)), jnp.float32)
    p2 = jnp.asarray(rng.normal(size=(3, C)), jnp.float32)
    kw = dict(target_size=32, num_patches=4, chunk=2)

    before = T._onboard_fn.cache_info()
    e1 = T.onboard_object((fn, p1), (fn, p1), rgbas, poses, **kw)
    e2 = T.onboard_object((fn, p2), (fn, p2), rgbas, poses, **kw)
    after = T._onboard_fn.cache_info()
    # one program served both param sets (misses +1 for the first build,
    # then a cache hit — weights are call arguments, not trace constants)
    assert after.misses == before.misses + 1, (before, after)
    assert after.hits == before.hits + 1, (before, after)
    assert not np.allclose(np.asarray(e1["ae_features"]),
                           np.asarray(e2["ae_features"]))

    # legacy bare-closure form still works and matches the pair form
    closure = jax.jit(lambda x: fn(p1, x))
    e3 = T.onboard_object(closure, closure, rgbas, poses, **kw)
    np.testing.assert_allclose(
        np.asarray(e1["ae_features"]), np.asarray(e3["ae_features"]),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(e1["Ms"]), np.asarray(e3["Ms"]))
