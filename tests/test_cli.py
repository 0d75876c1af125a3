"""End-to-end CLI test: python test.py on the synthetic BOP fixture with tiny
nets — exercises config loading, template onboarding from disk, detection
decoding, the jitted pipeline, localization filtering, and csv merging."""

import os

import numpy as np
import pytest

from tests import synthetic_bop


def test_cli_coarse_end_to_end(tmp_path, monkeypatch):
    root = synthetic_bop.build(str(tmp_path))
    monkeypatch.setenv("GIGAPOSE_TINY", "1")

    import test as test_cli

    test_cli.main(
        [
            f"machine.root_dir={root}",
            "test_dataset_name=tudl",
            "run_id=fixture",
            "data.template.num_templates=8",
        ]
    )
    from gigapose_tpu.dataloader import bop_io

    pred_dir = os.path.join(root, "results", "large_fixture", "predictions")
    csvs = [f for f in os.listdir(pred_dir) if f.endswith(".csv")]
    assert any("MultiHypothesis" in c for c in csvs)
    top1 = bop_io.load_bop_csv(
        os.path.join(pred_dir, "large-pbrreal-rgb-mmodel_tudl-test_fixture.csv")
    )
    assert len(top1) == 2  # one instance per fixture object
    assert sorted(r["obj_id"] for r in top1) == [1, 2]
    r = top1[0]
    for row in top1:
        assert row["scene_id"] == 1 and row["im_id"] == 0
        assert np.isfinite(row["R"]).all() and np.isfinite(row["t"]).all()
    # runtime protocol: detection_time + batch time > detection_time alone
    assert r["time"] > 0.12
    topk = bop_io.load_bop_csv(
        os.path.join(
            pred_dir, "large-pbrreal-rgb-mmodel_tudl-test_fixtureMultiHypothesis.csv"
        ),
        extra_column="instance_id",
    )
    assert len(topk) == 10  # k hypotheses per instance, 2 instances

    # --- train a tiny refiner checkpoint and chain the refinement CLI
    # (refine.py:20-78 path incl. refiner_checkpoint loading)
    from gigapose_tpu.scripts.train_refiner import main as train_refiner_cli

    ckpt_dir = os.path.join(root, "refiner_ckpt")
    train_refiner_cli(
        [
            f"cad_dir={os.path.join(root, 'datasets', 'tudl', 'models')}",
            f"out_dir={ckpt_dir}",
            "steps=2", "batch_size=2", "render=64", "width=8", "scorer_width=8",
        ]
    )
    import refine as refine_cli

    refine_cli.main(
        [
            f"machine.root_dir={root}",
            "test_dataset_name=tudl",
            "run_id=fixture",
            "n_refine_iterations=2",
            "min_score=0",
            f"refiner_checkpoint={ckpt_dir}",
        ]
    )
    ref_dir = os.path.join(root, "results", "large_fixture", "predictions_refined")
    refined = bop_io.load_bop_csv(
        os.path.join(ref_dir, "large-pbrreal-rgb-mmodel_tudl-test_fixture.csv")
    )
    assert len(refined) == 2
    rr = refined[0]
    assert np.isfinite(rr["R"]).all() and np.isfinite(rr["t"]).all()
    # refined runtime includes coarse time + refinement time
    assert rr["time"] > r["time"]
    # rotation stays orthonormal through the update chain
    np.testing.assert_allclose(rr["R"].T @ rr["R"], np.eye(3), atol=1e-4)


def test_cli_detection_setting(tmp_path, monkeypatch):
    """test_setting=detection: targets come from the detections themselves."""
    root = synthetic_bop.build(str(tmp_path))
    monkeypatch.setenv("GIGAPOSE_TINY", "1")

    import test as test_cli

    test_cli.main(
        [
            f"machine.root_dir={root}",
            "test_dataset_name=tudl",
            "test_setting=detection",
            "run_id=det",
            "data.template.num_templates=8",
            "model.feature_dtype=bf16",  # bf16 store wiring
        ]
    )
    from gigapose_tpu.dataloader import bop_io

    pred_dir = os.path.join(root, "results", "large_det", "predictions")
    top1 = bop_io.load_bop_csv(
        os.path.join(pred_dir, "large-pbrreal-rgb-mmodel_tudl-test_det.csv")
    )
    assert len(top1) == 2 and sorted(r["obj_id"] for r in top1) == [1, 2]


def test_cli_onthefly_template_rendering(tmp_path, monkeypatch):
    """SURVEY §7 stage 8: no rendered template set on disk -> test.py renders
    the icosphere views from the dataset's CAD models with the native
    rasterizer, onboards, and runs (BOP'24 model-based-unseen onboarding)."""
    import shutil

    root = synthetic_bop.build(str(tmp_path))
    shutil.rmtree(os.path.join(root, "datasets", "templates"))
    monkeypatch.setenv("GIGAPOSE_TINY", "1")

    import test as test_cli

    test_cli.main(
        [
            f"machine.root_dir={root}",
            "test_dataset_name=tudl",
            "run_id=fly",
            "data.template.num_templates=8",
            "data.template.level_templates=0",  # 42 views: keep CPU cost low
        ]
    )
    # the rendered set landed in the reference layout and inference ran
    tdir = os.path.join(root, "datasets", "templates", "tudl")
    assert os.path.isdir(os.path.join(tdir, "000001"))
    assert os.path.exists(os.path.join(tdir, "object_poses", "000001.npy"))
    from gigapose_tpu.dataloader import bop_io

    pred_dir = os.path.join(root, "results", "large_fly", "predictions")
    top1 = bop_io.load_bop_csv(
        os.path.join(pred_dir, "large-pbrreal-rgb-mmodel_tudl-test_fly.csv")
    )
    assert len(top1) == 2
    for row in top1:
        assert np.isfinite(row["R"]).all() and np.isfinite(row["t"]).all()


def test_cli_so3grid_coarse_refine(tmp_path, monkeypatch):
    """refine.py coarse_mode=so3grid: SO(3)-grid hypothesis classification
    over the full 576-point grid (assets/so3_grid_576.qua) + refinement,
    end to end from CNOS detections alone — the reference's
    forward_coarse_model path (pose_estimator.py:322+). No coarse csv needed."""
    monkeypatch.setenv("GIGAPOSE_TINY", "1")
    root = synthetic_bop.build(str(tmp_path))
    import refine as refine_cli

    refine_cli.main([
        f"machine.root_dir={root}",
        "test_dataset_name=tudl",
        "run_id=so3",
        "coarse_mode=so3grid",
        "so3_grid_size=576",
        "n_refine_iterations=1",
    ])
    from gigapose_tpu.dataloader import bop_io

    csv = os.path.join(
        root, "results", "large_so3", "predictions_refined",
        "large-pbrreal-rgb-mmodel_tudl-test_so3.csv",
    )
    rows = bop_io.load_bop_csv(csv)
    assert len(rows) >= 1
    for r in rows:
        R = np.asarray(r["R"])
        # valid rotation drawn from the grid and carried through refinement
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
        assert np.isfinite(np.asarray(r["t"])).all()
