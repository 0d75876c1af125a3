"""Coarse inference CLI (the reference's test.py:15-87, same override surface).

Usage:
    python test.py test_dataset_name=lmo run_id=0 [model=small] [key=value ...]

Pipeline: load config -> build estimator (+ optional torch-ckpt conversion) ->
onboard templates -> run the BOP test split -> write npz batches + BOP csv.
"""

from __future__ import annotations

import os
import os.path as osp
import sys


def build_estimator(cfg, tiny: bool = False):
    from gigapose_tpu.models.ist_net import ISTBackbone, ISTNet, Regressor
    from gigapose_tpu.pipeline.estimator import EstimatorConfig, GigaPoseEstimator

    pallas = cfg.model.get("use_pallas_matching", "auto")
    if str(pallas) == "auto":
        # fused Pallas kernel only Mosaic-compiles on TPU; measured 10x
        # faster than the XLA lowering on v5e at ViT-L shapes
        # (2.95 vs 28.9 ms matching, ROUND_NOTES r3)
        import jax

        pallas = jax.default_backend() == "tpu"
    est_cfg = EstimatorConfig(
        k=cfg.model.testing_metric.k,
        sim_threshold=cfg.model.testing_metric.sim_threshold,
        patch_threshold=cfg.model.testing_metric.patch_threshold,
        pixel_threshold=cfg.model.ransac.pixel_threshold,
        use_pallas_matching=bool(pallas),
    )
    if tiny:  # smoke/e2e-testing path: tiny nets, full pipeline
        import jax
        import jax.numpy as jnp

        from gigapose_tpu.models.ae_net import AENet

        ae = AENet(model_name="vit_tiny_test")
        ist = ISTNet(
            backbone=ISTBackbone(
                initial_dim=16, block_dims=(16, 16, 24, 32),
                descriptor_size=32, input_size=256,
            ),
            regressor=Regressor(hidden_dim=32),
        )
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        d224 = jnp.zeros((1, 3, 224, 224), jnp.float32)
        dpts = jnp.zeros((1, 4, 2), jnp.float32)
        est = GigaPoseEstimator(
            ae_net=ae, ist_net=ist,
            ae_params=ae.init(k1, d224),
            ist_vars=ist.init(k2, d224, d224, dpts, dpts),
            config=est_cfg,
        )
        return _maybe_quantize(est, cfg)

    cdt = str(cfg.model.get("compute_dtype") or "bf16")
    est = GigaPoseEstimator.create(
        model_name=cfg.model.ae_net.backbone,
        config=est_cfg,
        ist_descriptor_size=cfg.model.ist_net.descriptor_size,
        # bf16 matmuls in the ViT (f32 LN/residual): 394 vs 229 crops/s on
        # ViT-L (BENCH r2); set model.compute_dtype=f32 for strict
        # checkpoint-parity evaluation
        compute_dtype="bfloat16" if cdt in ("bf16", "bfloat16") else None,
    )
    ckpt = cfg.model.get("checkpoint_path")
    if ckpt and str(ckpt).endswith(".ckpt") and osp.exists(str(ckpt)):
        # reference torch checkpoint -> converted flax params
        from gigapose_tpu.models.convert import gigapose_ckpt_to_flax
        from gigapose_tpu.models.vit import VIT_CONFIGS

        depth = VIT_CONFIGS[cfg.model.ae_net.backbone].depth
        converted = gigapose_ckpt_to_flax(str(ckpt), depth)
        est.ae_params = {"params": converted["ae"]}
        ist_params, ist_stats = converted["ist"]
        est.ist_vars = {"params": ist_params, "batch_stats": ist_stats}
        print(f"Loaded + converted torch checkpoint {ckpt}")
    elif ckpt and osp.isdir(str(ckpt)):
        # our own orbax train-state checkpoint (train.py output dir or a
        # specific step dir)
        from gigapose_tpu.training import checkpoint as ckpt_lib
        from gigapose_tpu.training.state import OptimConfig, create_train_state
        import jax

        path = str(ckpt)
        last = ckpt_lib.latest_checkpoint(path)
        if last:
            path = last
        template, _ = create_train_state(
            est.ae_net, est.ist_net, jax.random.PRNGKey(0), OptimConfig()
        )
        state = ckpt_lib.restore_checkpoint(path, template)
        est.ae_params = {"params": state.ae_params}
        est.ist_vars = {
            "params": state.ist_params,
            "batch_stats": state.ist_batch_stats,
        }
        print(f"Loaded orbax checkpoint {path} (step {int(state.step)})")
    return _maybe_quantize(est, cfg)


def _maybe_quantize(est, cfg):
    """model.serving_quant: auto (int8 on TPU, off elsewhere) | int8 | off.
    Applied after checkpoint loading so the quantized tree derives from the
    served weights; onboarding below then uses the same quantized extractor
    for the template store (feature-space consistency)."""
    sq = str(cfg.model.get("serving_quant", "auto")).lower()
    if sq == "auto":
        import jax

        sq = "int8" if jax.default_backend() == "tpu" else "off"
    if sq == "int8":
        # model.serving_quant_ist: off (default, pending the on-chip A/B) |
        # int8 (dynamic per-image scales — the r4 measured loser) |
        # int8-static (static scales calibrated at onboarding; the quant
        # chain fuses into each conv's producer — models/ist_int8)
        ist_mode = str(cfg.model.get("serving_quant_ist", "off")).lower()
        ist_q = {"int8": True, "int8-static": "static"}.get(ist_mode, False)
        est.quantize_serving(ist=ist_q)
        print("AE serving precision: int8 W8A8 fused kernels "
              + ("+ int8 IST convs "
                 + ("(static scales) " if ist_q == "static" else "")
                 if ist_q else "")
              + "(model.serving_quant=off for the bf16/f32 flax path)")
    return est


def _cache_tag(cfg, est):
    """Onboarded-store cache key: int8-served features are not
    interchangeable with f32/bf16 caches, and an int8-IST store is not
    interchangeable with a float-IST one — the key encodes BOTH serving
    precisions (quantize_serving: queries and store must share one
    extractor)."""
    tag = cfg.get("onboarding_cache")
    if not tag:
        return tag
    if type(est.ae_net).__name__ == "AENetInt8":
        tag = f"{tag}-int8"
    if type(est.ist_net).__name__ == "ISTNetInt8":
        # static-scale features are not interchangeable with dynamic-scale
        # ones (the scales round differently); separate cache namespaces
        suffix = "s" if getattr(est.ist_net, "static_scales", False) else ""
        tag = f"{tag}-int8ist{suffix}"
    return tag


def main(argv=None):
    # multi-host first, before any backend touch (mirrors the reference's
    # early NCCL init); no-op without the GIGAPOSE_COORDINATOR/_DISTRIBUTED
    # env. Multi-process inference splits images round-robin across
    # processes (runner.run), each computing on its local chips only.
    from gigapose_tpu.parallel.multihost import maybe_initialize

    _, n_proc = maybe_initialize()

    from gigapose_tpu.dataloader.test_set import InferenceDataset
    from gigapose_tpu.pipeline.runner import CoarseRunner
    from gigapose_tpu.utils.config import load_config

    overrides = list(argv if argv is not None else sys.argv[1:])
    # hydra-style group selection: model=small swaps the model group file
    group_sel = [o for o in overrides if o.startswith("model=")]
    cfg = load_config("test", [o for o in overrides if not o.startswith("model=")])
    if group_sel:
        from gigapose_tpu.utils.config import CONFIG_DIR, _deep_merge, Config
        import yaml

        name = group_sel[0].split("=", 1)[1]
        with open(osp.join(CONFIG_DIR, "model", f"{name}.yaml")) as f:
            cfg = Config(_deep_merge(cfg, {"model": yaml.safe_load(f)}))

    ds = cfg.test_dataset_name
    assert ds, "test_dataset_name=... is required"
    root = osp.join(cfg.machine.root_dir, "datasets")
    save_dir = cfg.get("save_dir") or osp.join(
        cfg.machine.root_dir, "results", f"{cfg.model.model_name}_{cfg.run_id}"
    )
    os.makedirs(save_dir, exist_ok=True)
    if cfg.get("disable_output"):
        from gigapose_tpu.utils.logging import disable_output

        disable_output(osp.join(save_dir, "console.log"))

    est = build_estimator(cfg, tiny=bool(int(os.environ.get("GIGAPOSE_TINY", "0"))))
    template_dir = cfg.data.template.dir if cfg.get("data") and cfg.data.template.dir else osp.join(
        root, "templates", ds
    )
    # on-the-fly onboarding (BOP'24 model-based unseen, SURVEY §7 stage 8):
    # when no rendered template set exists but the dataset ships CAD models,
    # render the icosphere views in-process with the native rasterizer and
    # proceed straight to feature onboarding (reference: on-the-fly
    # render_bop_templates + set_template_data for new objects)
    cad_dir = osp.join(root, ds, "models")
    if not osp.isdir(template_dir) and osp.isdir(cad_dir):
        from gigapose_tpu.scripts import render_templates

        level = (
            cfg.data.template.level_templates
            if cfg.get("data") and cfg.data.template.get("level_templates")
            else 1
        )
        print(f"No template set at {template_dir}; rendering from {cad_dir}")
        render_templates.main(
            [f"cad_dir={cad_dir}", f"out_dir={template_dir}", f"level={level}"]
        )
    import jax
    import jax.numpy as jnp

    from gigapose_tpu.parallel.mesh import make_mesh

    if n_proc > 1:
        # per-image work is process-local; shard detections over local chips
        mesh = make_mesh(local=True) if len(jax.local_devices()) > 1 else None
    else:
        mesh = make_mesh() if jax.device_count() > 1 else None
    runner = CoarseRunner.onboard(
        est,
        template_dir=template_dir,
        save_dir=save_dir,
        dataset_name=ds,
        num_templates=cfg.data.template.num_templates if cfg.get("data") else None,
        scale_factor=cfg.data.template.scale_factor if cfg.get("data") else 1.0,
        max_dets_per_forward=cfg.get("max_num_dets_per_forward"),
        mesh=mesh,
        store_shards=int(cfg.get("store_shards") or 1),
        feature_dtype=(
            jnp.bfloat16 if str(cfg.model.get("feature_dtype", "")) == "bf16"
            else None
        ),
        cache_tag=_cache_tag(cfg, est),
    )
    dataset = InferenceDataset(
        root_dir=root, dataset_name=ds, test_setting=cfg.test_setting,
        depth_scale=cfg.data.depth_scale if cfg.get("data") else 10.0,
    )
    paths = runner.run(
        dataset,
        test_setting=cfg.test_setting,
        model_name=cfg.model.model_name,
        run_id=cfg.run_id,
        max_images=cfg.get("max_images"),
    )
    if paths:  # rank-0 only in multi-process runs (runner merges there)
        print("Wrote:", *paths, sep="\n  ")


if __name__ == "__main__":
    main()
