"""Refinement CLI (the reference's refine.py:20-78, same override surface).

Usage:
    python refine.py test_dataset_name=lmo run_id=0 [use_multiple=true] ...

Finds the coarse (Multi)Hypothesis csv written by test.py, loads the CAD
models, runs render-and-compare refinement + scoring, writes the refined csv.
"""

from __future__ import annotations

import os
import os.path as osp
import sys


def main(argv=None):
    # multi-process refinement (the reference runs refine.py under PL-DDP,
    # trainer.test splitting images over ranks): env-driven
    # jax.distributed.initialize, images split round-robin in run_refinement,
    # rank-0 csv merge. No-op without GIGAPOSE_COORDINATOR/_DISTRIBUTED.
    from gigapose_tpu.parallel.multihost import maybe_initialize

    maybe_initialize()

    from gigapose_tpu.dataloader.scene import DirSceneSource, TarSceneSource
    from gigapose_tpu.refiner.refiner import RefinerConfig, RenderCompareRefiner
    from gigapose_tpu.refiner.runner import find_init_pose_path, run_refinement
    from gigapose_tpu.utils.config import load_config

    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = load_config("test", overrides)
    ds = cfg.test_dataset_name
    assert ds, "test_dataset_name=... is required"
    root = osp.join(cfg.machine.root_dir, "datasets")
    save_dir = cfg.get("save_dir") or osp.join(
        cfg.machine.root_dir, "results", f"{cfg.model.model_name}_{cfg.run_id}"
    )
    pred_dir = osp.join(save_dir, "predictions")
    # coarse_mode=so3grid: hypotheses from SO(3)-grid classification over CNOS
    # detections (the reference's forward_coarse_model path) instead of the
    # coarse csv — forces the megapose refiner architecture
    coarse_mode = str(cfg.get("coarse_mode") or "csv")
    init_path = None
    if coarse_mode == "csv":
        init_path = cfg.get("init_loc_path") or find_init_pose_path(
            pred_dir, ds, cfg.model.model_name, cfg.run_id,
            use_multiple=bool(cfg.use_multiple),
        )

    cad_name = "models_cad" if ds == "tless" else "models"
    cad_dir = osp.join(root, ds, cad_name)
    mesh_paths = {}
    for f in sorted(os.listdir(cad_dir)):
        if f.endswith((".ply", ".obj")):
            obj_id = int("".join(c for c in osp.splitext(f)[0] if c.isdigit()) or 0)
            mesh_paths[obj_id] = osp.join(cad_dir, f)

    tiny = bool(int(os.environ.get("GIGAPOSE_TINY", "0")))
    mp_refiner_ckpt = cfg.get("megapose_refiner_ckpt")
    mp_coarse_ckpt = cfg.get("megapose_coarse_ckpt")
    if (mp_refiner_ckpt or mp_coarse_ckpt
            or cfg.get("refiner_type") == "megapose"
            or coarse_mode == "so3grid"):
        # released-checkpoint architecture: WideResNet34 twins, (240, 320)
        # crops, rgb+normals renders (ref: refiner_utils.py:56-116)
        from gigapose_tpu.refiner.megapose_refiner import (
            MegaposeRefiner,
            MegaposeRefinerConfig,
        )

        mcfg = MegaposeRefinerConfig(
            n_iterations=int(cfg.get("n_refine_iterations") or 5),
            render_size=(60, 80) if tiny else (240, 320),
            n_sample_points=8 if tiny else 500,
            n_rendered_views=int(cfg.get("n_rendered_views") or 1),
        )
        refiner = MegaposeRefiner.from_checkpoints(
            mp_refiner_ckpt and str(mp_refiner_ckpt),
            mp_coarse_ckpt and str(mp_coarse_ckpt),
            mesh_paths,
            config=mcfg,
            width=0.125 if tiny else 1.0,
        )
    else:
        rcfg = RefinerConfig(
            n_iterations=int(cfg.get("n_refine_iterations") or 5),
            render_size=(64, 64) if tiny else (160, 160),
            n_sample_points=8 if tiny else 500,
            # renderer=device: rasterize on-TPU inside one jitted loop (no
            # per-iteration host round trips); renderer=host reproduces the
            # reference's CPU-render structure, with optional chunk-level
            # render/compute overlap via refine_pipeline_chunks
            renderer=str(cfg.get("refine_renderer") or "host"),
            pipeline_chunks=int(cfg.get("refine_pipeline_chunks") or 1),
        )
        refiner = RenderCompareRefiner.create(
            mesh_paths, config=rcfg,
            refiner_width=8 if tiny else 64, scorer_width=8 if tiny else 32,
        )
        ckpt = cfg.get("refiner_checkpoint")
        if ckpt:
            # orbax weights from gigapose_tpu.scripts.train_refiner
            from gigapose_tpu.scripts.train_refiner import load_refiner_checkpoint

            refiner = load_refiner_checkpoint(str(ckpt), refiner)
            print(f"Loaded refiner checkpoint {ckpt}")

    split_dir = osp.join(root, ds, "test")
    has_tar = osp.isdir(split_dir) and any(
        f.endswith(".tar") for f in os.listdir(split_dir)
    )
    source = (
        TarSceneSource(split_dir, depth_scale=cfg.data.depth_scale, load_depth=False)
        if has_tar
        else DirSceneSource(split_dir, load_depth=False, load_masks=False)
    )
    if coarse_mode == "so3grid":
        from gigapose_tpu.refiner.runner import run_so3_coarse_refinement

        paths = run_so3_coarse_refinement(
            refiner,
            source,
            root_dir=osp.join(cfg.machine.root_dir, "datasets"),
            save_dir=save_dir,
            dataset_name=ds,
            model_name=cfg.model.model_name,
            run_id=cfg.run_id,
            grid_size=int(cfg.get("so3_grid_size") or 576),
            max_images=cfg.get("max_images"),
        )
    else:
        paths = run_refinement(
            refiner,
            source,
            init_path,
            save_dir=save_dir,
            dataset_name=ds,
            model_name=cfg.model.model_name,
            run_id=cfg.run_id,
            max_images=cfg.get("max_images"),
            min_score=cfg["min_score"] if "min_score" in cfg else 0.25,
        )
    if paths:  # rank-0 only in multi-process runs (runner merges there)
        print("Wrote:", *paths, sep="\n  ")


if __name__ == "__main__":
    main()
