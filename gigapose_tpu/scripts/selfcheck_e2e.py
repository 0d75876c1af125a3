"""Self-check: train tiny nets on a synthetic fixture, then verify the full
coarse pipeline recovers the correct 6D pose.

This closes the loop the unit tests can't: real training (InfoNCE + scale/
in-plane regression) must make retrieval + regression + RANSAC + recovery
produce a metrically correct pose on held-out data. The fixture object is a
textured plane whose ground-truth test pose is known analytically.

Usage:  python -m gigapose_tpu.scripts.selfcheck_e2e [steps=150] [root=/tmp/..]
Prints a JSON line with the final translation/rotation errors.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys

import numpy as np


def main(argv=None):
    kv = dict(a.split("=", 1) for a in (argv if argv is not None else sys.argv[1:]))
    steps = int(kv.get("steps", 150))
    root = kv.get("root") or "/tmp/gigapose_selfcheck"
    seed = int(kv.get("seed", 0))
    # rgb_aug=true enables the reference's photometric augmentation stack.
    # Default OFF here: the megapose intervals (brightness 0.1-6, contrast
    # 0.2-50) are calibrated for >2 TB of webdataset scenes; on this 8-image
    # fixture they make 150-step convergence a coin flip (most seeds fail,
    # with either loader rng scheme — measured r2). The selfcheck validates
    # geometry + training mechanics; the aug stack has its own unit tests.
    rgb_aug = kv.get("rgb_aug", "false").lower() == "true"

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))
    from tests import synthetic_bop

    synthetic_bop.build(root)

    import jax

    from gigapose_tpu.dataloader.scene import DirSceneSource
    from gigapose_tpu.dataloader.train_set import TrainLoader
    from gigapose_tpu.models.ae_net import AENet
    from gigapose_tpu.models.ist_net import ISTBackbone, ISTNet, Regressor
    from gigapose_tpu.training.loop import FitConfig, fit
    from gigapose_tpu.training.state import OptimConfig

    datasets = osp.join(root, "datasets")
    ae = AENet(model_name="vit_tiny_test")
    ist = ISTNet(
        backbone=ISTBackbone(initial_dim=16, block_dims=(16, 16, 24, 32),
                             descriptor_size=32, input_size=256),
        regressor=Regressor(hidden_dim=32),
    )
    loader = TrainLoader(
        scene_source=DirSceneSource(osp.join(datasets, "tudl", "train_pbr")),
        template_dir=osp.join(datasets, "templates", "tudl"),
        batch_size=3,
        rgb_augmentation=rgb_aug,
        inplane_augmentation=True,
        seed=seed,
    )
    state = fit(
        ae, ist, loader,
        optim_cfg=OptimConfig(
            ae_lr=float(kv.get("ae_lr", 3e-4)),
            ist_lr=float(kv.get("ist_lr", 1e-3)),
            warm_up_steps=int(kv.get("warm_up", 10)),
            # tiny-config stabilizers (ROUND_NOTES r3: the short-budget
            # InfoNCE collapse fix — grad clipping + temperature warm-up)
            grad_clip=float(kv.get("grad_clip", 1.0)),
            tau_start=float(kv.get("tau_start", 0.5)),
            tau_warmup_steps=int(kv.get("tau_warmup", 50)),
        ),
        fit_cfg=FitConfig(max_steps=steps, log_every=max(steps // 5, 1),
                          checkpoint_every=10**9),
    )

    # --- run the coarse pipeline with the trained weights
    from gigapose_tpu.pipeline.estimator import EstimatorConfig, GigaPoseEstimator
    from gigapose_tpu.pipeline.runner import CoarseRunner
    from gigapose_tpu.dataloader.test_set import InferenceDataset
    from gigapose_tpu.dataloader import bop_io

    est = GigaPoseEstimator(
        ae_net=ae, ist_net=ist,
        ae_params={"params": state.ae_params},
        ist_vars={"params": state.ist_params, "batch_stats": state.ist_batch_stats},
        config=EstimatorConfig(),
    )
    save_dir = osp.join(root, "results", "selfcheck")
    runner = CoarseRunner.onboard(
        est, template_dir=osp.join(datasets, "templates", "tudl"),
        save_dir=save_dir, dataset_name="tudl", num_templates=8,
    )
    dataset = InferenceDataset(root_dir=datasets, dataset_name="tudl")
    paths = runner.run(dataset, model_name="selfcheck", run_id="0")
    top1 = bop_io.load_bop_csv(paths[0])[0]

    # --- analytic GT of the fixture's test image (synthetic_bop.build):
    # texture pasted at (qy, qx) = (100, 380), size 120 px, depth 400 mm
    K = np.array([[572.4114, 0, 320], [0, 573.57043, 240], [0, 0, 1.0]])
    cx_px, cy_px = 380 + 60, 100 + 60
    z = 400.0
    gt_t = np.array(
        [(cx_px - K[0, 2]) * z / K[0, 0], (cy_px - K[1, 2]) * z / K[1, 1], z]
    )
    t_err = float(np.linalg.norm(top1["t"].reshape(3) - gt_t))
    R = top1["R"]
    ang_err = float(
        np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))
    )
    result = {
        "steps": steps,
        "t_err_mm": round(t_err, 2),
        "rot_err_deg": round(ang_err, 2),
        "score": top1["score"],
        "gt_t": gt_t.round(1).tolist(),
        "pred_t": np.asarray(top1["t"]).reshape(3).round(1).tolist(),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
