"""train.py CLI smoke on the synthetic fixture: host loader -> device prep ->
optax steps -> orbax checkpoint, with tiny nets."""

import os

import numpy as np
import pytest

from tests import synthetic_bop


def test_train_cli_smoke(tmp_path, monkeypatch):
    root = synthetic_bop.build(str(tmp_path))
    monkeypatch.setenv("GIGAPOSE_TINY", "1")

    import train as train_cli

    train_cli.main(
        [
            f"machine.root_dir={root}",
            "train_dataset_name=tudl",
            "machine.batch_size=2",
            "max_steps=3",
            "checkpoint_every=2",
            "log_every=1",
            "run_id=fixture",
            "val_dataset_name=tudl",
            "val_split=train_pbr",
            "val_every=2",
        ]
    )
    ckpt_dir = os.path.join(root, "results", "large_fixture", "checkpoints")
    assert os.path.exists(os.path.join(ckpt_dir, "last"))
    # metrics sink wrote scalars incl. validation
    import json

    lines = [
        json.loads(l)
        for l in open(
            os.path.join(root, "results", "large_fixture", "logs", "metrics.jsonl")
        ).read().splitlines()
    ]
    assert any("total" in l for l in lines)
    assert any("val/matching" in l for l in lines)


def test_train_cli_ist_warm_start(tmp_path, monkeypatch, capsys):
    """pretrained_ist_path= loads a torch state dict into the IST backbone
    before training (the reference's LoFTR warm start, train.py:82-88)."""
    import torch

    root = synthetic_bop.build(str(tmp_path))
    monkeypatch.setenv("GIGAPOSE_TINY", "1")

    # a torch-layout state dict matching the tiny ISTBackbone's first conv/bn
    rng = np.random.default_rng(0)
    sd = {
        "backbone.conv1.weight": torch.from_numpy(
            rng.normal(size=(8, 3, 7, 7)).astype(np.float32)
        ),
        "backbone.bn1.weight": torch.ones(8),
        "backbone.bn1.bias": torch.zeros(8),
        "backbone.bn1.running_mean": torch.zeros(8),
        "backbone.bn1.running_var": torch.ones(8),
    }
    ckpt = str(tmp_path / "loftr_like.ckpt")
    torch.save({"state_dict": sd}, ckpt)

    import train as train_cli

    train_cli.main(
        [
            f"machine.root_dir={root}",
            "train_dataset_name=tudl",
            "machine.batch_size=2",
            "max_steps=1",
            "checkpoint_every=10",
            "log_every=1",
            "run_id=warmstart",
            f"pretrained_ist_path={ckpt}",
        ]
    )
    out = capsys.readouterr().out
    assert "Warm-started IST" in out and ": 5 tensors loaded" in out


def test_train_loader_workers_deterministic(tmp_path):
    """num_workers>1 yields byte-identical batches in the same order as the
    sequential path (per-observation child seeds drawn from the master
    stream make the sample sequence worker-count independent)."""
    root = synthetic_bop.build(str(tmp_path))
    import os as _os

    from gigapose_tpu.dataloader.scene import DirSceneSource
    from gigapose_tpu.dataloader.train_set import TrainLoader

    split = _os.path.join(root, "datasets", "tudl", "train_pbr")
    tdir = _os.path.join(root, "datasets", "templates", "tudl")

    def batches(workers):
        loader = TrainLoader(
            scene_source=DirSceneSource(split), template_dir=tdir,
            batch_size=2, seed=11, num_workers=workers,
        )
        return list(loader)

    seq, par = batches(1), batches(3)
    assert len(seq) == len(par) >= 1
    for a, b in zip(seq, par):
        for field in a.__dict__ if hasattr(a, "__dict__") else a._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
            )


def test_train_loader_and_prep(tmp_path):
    """The host loader + device prep yield a sane TrainBatch: the query IS the
    template view (same pose), so GT relScale is the crop ratio and
    relInplane ~ 0, and keypoints exist."""
    import jax.numpy as jnp

    root = synthetic_bop.build(str(tmp_path))
    from gigapose_tpu.dataloader.scene import DirSceneSource
    from gigapose_tpu.dataloader.train_set import TrainLoader, prepare_train_batch

    src = DirSceneSource(os.path.join(root, "datasets", "tudl", "train_pbr"))
    loader = TrainLoader(
        scene_source=src,
        template_dir=os.path.join(root, "datasets", "templates", "tudl"),
        batch_size=2,
        inplane_augmentation=False,
        rgb_augmentation=False,
    )
    rec = next(iter(loader))
    batch = prepare_train_batch(rec)
    assert batch.src_img.shape == (2, 3, 224, 224)
    valid = np.asarray(batch.src_pts[..., 0]) >= 0
    assert valid.sum() > 0, "no valid GT correspondences"
    # same pose + same K -> relInplane == 0; relScale = |q_M| / |t_M|
    rel_i = np.asarray(batch.rel_inplane)
    rel_i = np.minimum(rel_i, 2 * np.pi - rel_i)
    np.testing.assert_allclose(rel_i, 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(batch.rel_scale), 1.0, atol=0.05)
    # correspondences should be near-identity (same view, same crop geometry)
    sp = np.asarray(batch.src_pts)[valid]
    tp = np.asarray(batch.tar_pts)[valid]
    assert np.median(np.linalg.norm(sp - tp, axis=-1)) < 1.5
