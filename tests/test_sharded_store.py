"""View-sharded template store (parallel/sharded_store): the sharded serving
path must reproduce the replicated-store coarse_forward exactly — same
retrieved view ids, correspondences, and poses — on the 8-virtual-device CPU
mesh, for pure-tv and mixed dp x tv meshes, including score ties (duplicated
view) and non-divisible V (zero-padded views must never win)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigapose_tpu.ops.matching import match_templates
from gigapose_tpu.parallel.sharded_store import (
    coarse_forward_sharded,
    make_dp_tv_mesh,
    shard_template_store,
    sharded_match_and_gather,
)
from gigapose_tpu.pipeline.estimator import DetectionBatch, EstimatorConfig, coarse_forward
from gigapose_tpu.pipeline.templates import TemplateStore

from tests.test_pipeline import _net_driven_world, tiny_estimator


def _random_store_and_queries(B=8, O=2, V=13, P=16, C=24, C2=32, seed=0):
    rng = np.random.default_rng(seed)
    ae = rng.normal(size=(O, V, P, C)).astype(np.float32)
    ist = rng.normal(size=(O, V, P, C2)).astype(np.float32)
    masks = (rng.uniform(size=(O, V, P)) > 0.2).astype(np.float32)
    store = TemplateStore(
        ae_features=jnp.asarray(ae),
        ist_features=jnp.asarray(ist),
        masks=jnp.asarray(masks),
        Ms=jnp.tile(jnp.eye(3), (O, V, 1, 1)),
        poses=jnp.tile(jnp.eye(4), (O, V, 1, 1)).at[:, :, 2, 3].set(0.4),
        K=jnp.tile(jnp.asarray([[500.0, 0, 32], [0, 500, 32], [0, 0, 1]]), (O, 1, 1)),
    )
    labels = rng.integers(0, O, (B,)).astype(np.int32)
    # queries = noisy copies of a random view's features so retrieval has
    # real structure (distinct scores -> no accidental ties)
    v_pick = rng.integers(0, V, (B,))
    tar = ae[labels, v_pick] + 0.05 * rng.normal(size=(B, P, C)).astype(np.float32)
    tar_masks = (rng.uniform(size=(B, P)) > 0.1).astype(np.float32)
    return store, jnp.asarray(tar), jnp.asarray(tar_masks), jnp.asarray(labels)


def _reference_match_and_ist(store, tar, tar_masks, labels, cfg):
    src_ae = store.ae_features[labels]
    src_masks = store.masks[labels]
    match = match_templates(
        tar.astype(src_ae.dtype), src_ae, tar_masks, src_masks,
        k=cfg.k, sim_threshold=cfg.sim_threshold,
        patch_threshold=cfg.patch_threshold, num_patches=cfg.num_patches,
    )
    V = store.ist_features.shape[1]
    flat = store.ist_features.reshape((-1,) + store.ist_features.shape[2:])
    src_ist = flat[labels[:, None] * V + match.ids]
    return match, src_ist


@pytest.mark.parametrize("dp,tv", [(1, 8), (2, 4)])
def test_sharded_match_exact_vs_replicated(dp, tv):
    cfg = EstimatorConfig(k=2, num_patches=4)
    store, tar, tar_masks, labels = _random_store_and_queries()
    want, want_ist = _reference_match_and_ist(store, tar, tar_masks, labels, cfg)

    mesh = make_dp_tv_mesh(dp, tv)
    store_s = shard_template_store(store, mesh)
    # V=13 pads to a multiple of tv; padded views are all-masked
    assert store_s.num_views % tv == 0 and store_s.num_views >= 13

    got, got_ist = jax.jit(
        lambda t, m, l, s: sharded_match_and_gather(t, m, l, s, mesh, cfg),
        static_argnames=(),
    )(tar, tar_masks, labels, store_s)

    np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(want.ids))
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    np.testing.assert_array_equal(np.asarray(got.src_pts), np.asarray(want.src_pts))
    np.testing.assert_array_equal(np.asarray(got.tar_pts), np.asarray(want.tar_pts))
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_array_equal(np.asarray(got_ist), np.asarray(want_ist))


def test_sharded_merge_tie_breaks_like_topk():
    """Duplicate one view's features at a lower and a higher view id living on
    DIFFERENT shards: both paths must pick the lower id first."""
    cfg = EstimatorConfig(k=2, num_patches=4)
    store, tar, tar_masks, labels = _random_store_and_queries(B=4, V=12, seed=3)
    # view 9 (shard 3 of 4, or shard 4+ of 8) := exact copy of view 1 (shard 0)
    ae = np.asarray(store.ae_features).copy()
    masks = np.asarray(store.masks).copy()
    ist = np.asarray(store.ist_features).copy()
    ae[:, 9] = ae[:, 1]
    masks[:, 9] = masks[:, 1]
    ist[:, 9] = ist[:, 1]
    store = dataclasses.replace(
        store,
        ae_features=jnp.asarray(ae),
        masks=jnp.asarray(masks),
        ist_features=jnp.asarray(ist),
    )
    # make every query a copy of view 1 so views 1 and 9 tie at the top
    labels = jnp.zeros_like(labels)
    tar = store.ae_features[0, 1][None].repeat(tar.shape[0], 0)
    tar_masks = jnp.ones_like(tar_masks)

    want, _ = _reference_match_and_ist(store, tar, tar_masks, labels, cfg)
    mesh = make_dp_tv_mesh(1, 4)
    store_s = shard_template_store(store, mesh)
    got, _ = jax.jit(
        lambda t, m, l, s: sharded_match_and_gather(t, m, l, s, mesh, cfg)
    )(tar, tar_masks, labels, store_s)

    assert np.all(np.asarray(want.ids[:, 0]) == 1), "tie setup broken"
    assert np.all(np.asarray(want.ids[:, 1]) == 9), "tie setup broken"
    np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(want.ids))


@pytest.mark.parametrize("dp,tv", [(1, 4), (2, 2)])
def test_coarse_forward_sharded_e2e(dp, tv):
    """Full pipeline with tiny nets: sharded == replicated, end to end."""
    est = tiny_estimator()
    store, batch, v_star = _net_driven_world(est, B=4, V=6)
    mesh = make_dp_tv_mesh(dp, tv)
    # the reference runs jitted on the same mesh with the store replicated and
    # the batch placed identically, so the ONLY difference is the sharded
    # matching path (an untrained regressor's normalized cossin output
    # amplifies compilation-level numeric noise, so eager-vs-jit is not a
    # meaningful comparison here)
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    batch = jax.device_put(
        batch, NamedSharding(mesh, Pspec("dp" if dp > 1 else None))
    )
    store_r = jax.device_put(store, NamedSharding(mesh, Pspec()))
    want = jax.jit(
        lambda ae_p, ist_v, s, b: coarse_forward(
            est.ae_net, est.ist_net, ae_p, ist_v, s, b, cfg=est.config
        )
    )(est.ae_params, est.ist_vars, store_r, batch)
    store_s = shard_template_store(store, mesh)
    got = jax.jit(
        lambda ae_p, ist_v, s, b: coarse_forward_sharded(
            est.ae_net, est.ist_net, ae_p, ist_v, s, b, mesh, cfg=est.config
        )
    )(est.ae_params, est.ist_vars, store_s, batch)

    np.testing.assert_array_equal(
        np.asarray(got.view_ids), np.asarray(want.view_ids)
    )
    np.testing.assert_array_equal(np.asarray(got.failed), np.asarray(want.failed))
    np.testing.assert_allclose(
        np.asarray(got.sim_scores), np.asarray(want.sim_scores), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(got.poses), np.asarray(want.poses), rtol=1e-5, atol=1e-5
    )


def test_per_shard_memory_drops():
    """The point of the feature: each device holds only V/S of the features."""
    mesh = make_dp_tv_mesh(1, 8)
    store, *_ = _random_store_and_queries(V=16)
    store_s = shard_template_store(store, mesh)
    shard_shapes = [
        s.data.shape for s in store_s.ae_features.addressable_shards
    ]
    assert all(sh == (2, 2, 16, 24) for sh in shard_shapes), shard_shapes
    # metadata stays replicated at real V
    assert store_s.poses.shape[1] == 16


def test_sharded_pallas_matches_sharded_xla():
    """The fused Pallas matcher routed per-shard (interpret mode off-TPU)
    must agree with the XLA matcher inside the same shard_map."""
    cfg_x = EstimatorConfig(k=2, num_patches=4, use_pallas_matching=False)
    cfg_p = EstimatorConfig(k=2, num_patches=4, use_pallas_matching=True)
    store, tar, tar_masks, labels = _random_store_and_queries(V=16, seed=5)
    # pallas contract: pre-L2-normalized features
    tar = tar / np.linalg.norm(np.asarray(tar), axis=-1, keepdims=True).clip(1e-8)
    ae = np.asarray(store.ae_features)
    ae = ae / np.linalg.norm(ae, axis=-1, keepdims=True).clip(1e-8)
    store = dataclasses.replace(store, ae_features=jnp.asarray(ae))
    tar = jnp.asarray(tar)

    mesh = make_dp_tv_mesh(1, 4)
    store_s = shard_template_store(store, mesh)
    got_x, ist_x = jax.jit(
        lambda t, m, l, s: sharded_match_and_gather(t, m, l, s, mesh, cfg_x)
    )(tar, tar_masks, labels, store_s)
    got_p, ist_p = jax.jit(
        lambda t, m, l, s: sharded_match_and_gather(t, m, l, s, mesh, cfg_p)
    )(tar, tar_masks, labels, store_s)
    np.testing.assert_array_equal(np.asarray(got_p.ids), np.asarray(got_x.ids))
    np.testing.assert_array_equal(np.asarray(got_p.valid), np.asarray(got_x.valid))
    np.testing.assert_array_equal(
        np.asarray(got_p.src_pts), np.asarray(got_x.src_pts)
    )
    np.testing.assert_allclose(
        np.asarray(got_p.scores), np.asarray(got_x.scores), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_array_equal(np.asarray(ist_p), np.asarray(ist_x))


def test_cli_store_shards_end_to_end(tmp_path, monkeypatch):
    """python test.py store_shards=4: the serving CLI over a (dp=2, tv=4)
    virtual mesh produces a valid BOP csv (full onboarding -> sharded store
    -> sharded coarse forward -> filtering -> merge)."""
    from tests import synthetic_bop

    root = synthetic_bop.build(str(tmp_path))
    monkeypatch.setenv("GIGAPOSE_TINY", "1")

    import test as test_cli

    test_cli.main(
        [
            f"machine.root_dir={root}",
            "test_dataset_name=tudl",
            "run_id=shards",
            "data.template.num_templates=8",
            "store_shards=4",
            "model.testing_metric.k=2",  # per-shard views (8/4=2) must be >= k
        ]
    )
    from gigapose_tpu.dataloader import bop_io

    pred_dir = os.path.join(root, "results", "large_shards", "predictions")
    top1 = bop_io.load_bop_csv(
        os.path.join(pred_dir, "large-pbrreal-rgb-mmodel_tudl-test_shards.csv")
    )
    assert len(top1) == 2 and sorted(r["obj_id"] for r in top1) == [1, 2]
    for row in top1:
        assert np.isfinite(row["R"]).all() and np.isfinite(row["t"]).all()


def test_host_backed_store_shards_identically():
    """shard_template_store accepts a numpy-backed store (the to_host
    onboarding output) and produces the same sharded results — host padding
    + direct host->shard device_put, no full-store device residency."""
    cfg = EstimatorConfig(k=2, num_patches=4)
    store, tar, tar_masks, labels = _random_store_and_queries(V=12, seed=7)
    host_store = TemplateStore(
        **{
            f.name: np.asarray(getattr(store, f.name))
            for f in dataclasses.fields(TemplateStore)
        }
    )
    mesh = make_dp_tv_mesh(1, 4)
    fn = jax.jit(
        lambda t, m, l, s: sharded_match_and_gather(t, m, l, s, mesh, cfg)
    )
    got_d, ist_d = fn(tar, tar_masks, labels, shard_template_store(store, mesh))
    got_h, ist_h = fn(
        tar, tar_masks, labels, shard_template_store(host_store, mesh)
    )
    np.testing.assert_array_equal(np.asarray(got_h.ids), np.asarray(got_d.ids))
    np.testing.assert_array_equal(np.asarray(ist_h), np.asarray(ist_d))


def test_onboard_to_host_then_shard():
    """onboard_templates(to_host=True) returns a numpy-backed store (peak
    device residency = one object) that shards and retrieves correctly."""
    from gigapose_tpu.pipeline.templates import onboard_templates

    est = tiny_estimator()
    rng = np.random.default_rng(11)
    rgbas = [rng.uniform(size=(6, 4, 56, 56)).astype(np.float32) for _ in range(2)]
    poses = [np.tile(np.eye(4, dtype=np.float32), (6, 1, 1)) for _ in range(2)]
    store = onboard_templates(
        est.ae_apply, est.ist_apply, rgbas, poses,
        target_size=56, num_patches=4, to_host=True,
    )
    assert isinstance(store.ae_features, np.ndarray)
    assert isinstance(store.masks, np.ndarray)

    mesh = make_dp_tv_mesh(2, 4)
    store_s = shard_template_store(store, mesh)
    tar = jnp.asarray(store.ae_features[[0, 1], 3])  # query = view 3 exactly
    got, _ = jax.jit(
        lambda t, m, l, s: sharded_match_and_gather(
            t, m, l, s, mesh, EstimatorConfig(k=2, num_patches=4)
        )
    )(tar, jnp.ones((2, 16)), jnp.asarray([0, 1], jnp.int32), store_s)
    assert np.all(np.asarray(got.ids[:, 0]) == 3)
