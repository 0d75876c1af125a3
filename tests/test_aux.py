"""Auxiliary subsystems: shard conversion roundtrip, vis, metrics sink,
validation metrics, ICP depth refiner."""

import json
import os

import numpy as np
import pytest

from tests import synthetic_bop


def test_convert_to_shards_roundtrip(tmp_path):
    root = synthetic_bop.build(str(tmp_path))
    split = os.path.join(root, "datasets", "tudl", "train_pbr")
    out = str(tmp_path / "shards")
    from gigapose_tpu.scripts.convert_to_shards import convert
    from gigapose_tpu.dataloader.scene import DirSceneSource, TarSceneSource

    n = convert(split, out, shard_size=2)
    assert n == 3
    assert os.path.exists(os.path.join(out, "key_to_shard.json"))
    assert len([f for f in os.listdir(out) if f.endswith(".tar")]) == 2

    dir_obs = list(DirSceneSource(split))
    tar_obs = list(TarSceneSource(out))
    assert len(tar_obs) == len(dir_obs) == 3
    a, b = dir_obs[0], tar_obs[0]
    np.testing.assert_array_equal(a.rgb, b.rgb)
    np.testing.assert_allclose(a.K, b.K)
    np.testing.assert_allclose(a.poses, b.poses)
    np.testing.assert_array_equal(a.masks, b.masks)
    np.testing.assert_allclose(a.depth, b.depth, atol=1e-6)

    # random access by key through key_to_shard.json (reference index
    # contract, convert_imagewise_to_webdataset.py:98-108)
    src = TarSceneSource(out)
    for want in dir_obs:
        got = src.lookup(want.key)
        assert got is not None and got.key == want.key
        np.testing.assert_array_equal(got.rgb, want.rgb)
    assert src.lookup("nonexistent_key") is None

    # lookup honors the blacklist just like sequential iteration: a key
    # resolving into a blacklisted shard must return None
    first_key = dir_obs[0].key
    shard_id = json.load(open(os.path.join(out, "key_to_shard.json")))[first_key]
    blocked = TarSceneSource(out, blacklist=[f"shard-{int(shard_id):06d}.tar"])
    assert blocked.lookup(first_key) is None


def test_depth_noise_and_background_augmentations():
    """The depth-noise family + background replacement (reference
    augmentations.py:121-430; unused by gigapose training but carried)."""
    from gigapose_tpu.dataloader import augment as A

    rng = np.random.default_rng(0)
    depth = np.zeros((48, 64), np.float32)
    depth[10:40, 20:50] = 0.5

    g = A.depth_gaussian_noise(depth, rng, std_dev=0.01)
    assert g.shape == depth.shape and np.all(g[depth == 0] == 0) and np.all(g >= 0)
    assert not np.allclose(g[depth > 0], depth[depth > 0])

    c = A.depth_correlated_gaussian_noise(depth, rng)
    assert np.all(c[depth == 0] == 0) and not np.allclose(c[depth > 0], 0.5)

    m = A.depth_missing(depth, rng, max_missing_fraction=0.5)
    assert (m > 0).sum() <= (depth > 0).sum()

    assert np.all(A.depth_dropout(depth) == 0)

    e = A.depth_ellipse_dropout(depth, rng, mean=8.0)
    assert (e > 0).sum() < (depth > 0).sum()  # some ellipses landed

    en = A.depth_ellipse_noise(depth, rng, mean=8.0, std_dev=0.05)
    assert np.all(en[depth == 0] == 0) and not np.allclose(en[depth > 0], 0.5)

    # every kernel size in the default interval, incl. even k (asymmetric pad)
    for k in range(3, 8):
        b = A.depth_blur(depth, rng, factor_interval=(k, k))
        assert b.shape == depth.shape, f"k={k}"
        # box blur preserves the mean away from borders
        np.testing.assert_allclose(b[15:35, 25:45], 0.5, atol=1e-6)

    seg = (depth > 0).astype(np.int32)
    bd = A.depth_background_dropout(depth, seg)
    np.testing.assert_array_equal(bd, depth)  # background already 0

    rgb = np.full((48, 64, 3), 100, np.uint8)
    bgs = [np.full((8, 8, 3), 200, np.uint8)]
    rep = A.replace_background(rgb, seg, bgs, rng)
    assert np.all(rep[seg == 0] == 200) and np.all(rep[seg > 0] == 100)


def test_vis_helpers(tmp_path):
    from gigapose_tpu.utils import vis

    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 224, 224)).astype(np.float32)
    pts = rng.integers(0, 16, size=(32, 2)).astype(np.float32)
    pts[::3] = -1
    canvas = vis.plot_keypoints(img, img, pts, pts)
    assert canvas.size == (448, 224)
    M = np.eye(3)
    M[:2, 2] = [10, -5]
    warp = vis.plot_affine_warp(img, img, M)
    assert warp.size == (672, 224)
    grid = vis.image_grid([canvas, canvas, canvas], nrow=2)
    assert grid.size == (896, 448)


def test_metrics_logger(tmp_path):
    from gigapose_tpu.utils.metrics import MetricsLogger

    m = MetricsLogger(str(tmp_path / "logs"), use_tensorboard=False)
    m.log_scalars(1, {"loss": 1.5})
    m.log_scalars(2, {"loss": 1.2, "acc": 0.7})
    m.close()
    lines = [
        json.loads(l)
        for l in open(tmp_path / "logs" / "metrics.jsonl").read().splitlines()
    ]
    assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 2


def test_validation_metrics(tmp_path):
    import jax

    root = synthetic_bop.build(str(tmp_path))
    from gigapose_tpu.dataloader.scene import DirSceneSource
    from gigapose_tpu.dataloader.train_set import TrainLoader, prepare_train_batch
    from gigapose_tpu.models.ae_net import AENet
    from gigapose_tpu.models.ist_net import ISTBackbone, ISTNet, Regressor
    from gigapose_tpu.training.validate import validation_metrics

    src = DirSceneSource(os.path.join(root, "datasets", "tudl", "train_pbr"))
    loader = TrainLoader(
        scene_source=src,
        template_dir=os.path.join(root, "datasets", "templates", "tudl"),
        batch_size=2, inplane_augmentation=False, rgb_augmentation=False,
    )
    batch = prepare_train_batch(next(iter(loader)))
    ae = AENet(model_name="vit_tiny_test")
    ist = ISTNet(
        backbone=ISTBackbone(initial_dim=8, block_dims=(8, 8, 12, 16),
                             descriptor_size=16, input_size=256),
        regressor=Regressor(hidden_dim=16),
    )
    import jax.numpy as jnp

    ae_params = ae.init(jax.random.PRNGKey(0), batch.src_img)
    ist_vars = ist.init(
        jax.random.PRNGKey(1), batch.src_img, batch.tar_img,
        batch.src_pts, batch.tar_pts,
    )
    m = validation_metrics(ae, ist, ae_params, ist_vars, batch)
    # query == template view: identical features -> near-perfect matching
    assert float(m["val/matching"]) < 2.0
    assert np.isfinite(float(m["val/scale_err"]))
    assert float(m["val/num_matches"]) > 10


def test_icp_depth_refiner(tmp_path):
    from tests.test_rasterizer import _write_cube_ply
    from gigapose_tpu.render.rasterizer import Rasterizer
    from gigapose_tpu.refiner.depth_refiner import ICPDepthRefiner

    from scipy.spatial.transform import Rotation

    mesh = str(tmp_path / "cube.ply")
    _write_cube_ply(mesh, size=0.08)
    r = Rasterizer(mesh)
    K = np.array([[572.4, 0, 320], [0, 573.5, 240], [0, 0, 1.0]], np.float32)
    gt = np.eye(4)
    # tilt so several faces are visible (a frontal flat face leaves in-plane
    # translation unconstrained for point-to-point ICP)
    gt[:3, :3] = Rotation.from_euler("xyz", [25, 30, 10], degrees=True).as_matrix()
    gt[:3, 3] = [0.0, 0.0, 0.5]
    _, gt_depth = r.render(K, gt.astype(np.float32), 640, 480)

    init = gt.copy()
    init[:3, 3] += [0.008, -0.005, 0.01]
    icp = ICPDepthRefiner({1: r}, {1: 1.0}, n_iterations=15,
                          max_correspondence_dist=0.05)
    refined, err = icp.refine_pose(init, gt_depth, K, 1)
    gt_err = np.linalg.norm(init[:3, 3] - gt[:3, 3])
    new_err = np.linalg.norm(refined[:3, 3] - gt[:3, 3])
    assert new_err < gt_err * 0.5, (gt_err, new_err)


def test_train_from_tar_shards(tmp_path):
    """TrainLoader over tar shards (the reference's webdataset train path)."""
    root = synthetic_bop.build(str(tmp_path))
    split = os.path.join(root, "datasets", "tudl", "train_pbr")
    shards = str(tmp_path / "train_shards")
    from gigapose_tpu.scripts.convert_to_shards import convert
    from gigapose_tpu.dataloader.scene import TarSceneSource
    from gigapose_tpu.dataloader.train_set import TrainLoader, prepare_train_batch

    convert(split, shards, shard_size=2)
    loader = TrainLoader(
        scene_source=TarSceneSource(shards),
        template_dir=os.path.join(root, "datasets", "templates", "tudl"),
        batch_size=2, inplane_augmentation=False, rgb_augmentation=False,
    )
    batch = prepare_train_batch(next(iter(loader)))
    valid = np.asarray(batch.src_pts[..., 0]) >= 0
    assert valid.sum() > 0
    np.testing.assert_allclose(np.asarray(batch.rel_scale), 1.0, atol=0.05)


def test_bench_watchdog_pet_rearm(monkeypatch):
    """bench.py's watchdog must be progress-aware: pet() re-arms the timer so
    a multi-model cold-compile run is bounded per milestone, not in total
    (a global-budget self-kill mid-session wedges the axon relay, r3)."""
    import time

    monkeypatch.setenv("GIGAPOSE_BENCH_WATCHDOG_S", "0.2")
    import bench

    fired = []
    wd = bench._arm_watchdog("test")
    monkeypatch.setattr(wd, "_fire", lambda: fired.append(1))
    # keep petting past the raw budget: must never fire
    for _ in range(4):
        time.sleep(0.1)
        wd.pet()
    assert not fired
    wd.cancel()
    time.sleep(0.3)
    assert not fired  # cancel() really cancels

    wd2 = bench._arm_watchdog("test2")
    monkeypatch.setattr(wd2, "_fire", lambda: fired.append(1))
    wd2.pet()  # re-arm installs the patched _fire
    time.sleep(0.35)
    assert fired  # un-petted watchdog still fires
    wd2.cancel()
