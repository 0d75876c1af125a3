"""Training CLI (the reference's train.py:20-104, same override surface).

Usage:
    python train.py train_dataset_name=<ds> machine.root_dir=<root> [key=value]

Builds the host TrainLoader over BOP-format scenes (tar shards or dirs) and
templates, then runs the data-parallel optax loop with orbax checkpoints.
"""

from __future__ import annotations

import os
import os.path as osp
import sys


def main(argv=None):
    # multi-host first, before any backend touch (the reference inits NCCL
    # equally early from SLURM env, train.py:40-45 + distributed.py:133-150);
    # single-process when the GIGAPOSE_COORDINATOR/_DISTRIBUTED env is absent
    from gigapose_tpu.parallel.multihost import maybe_initialize

    proc_id, n_proc = maybe_initialize()

    import jax

    from gigapose_tpu.dataloader.scene import DirSceneSource, TarSceneSource
    from gigapose_tpu.dataloader.train_set import TrainLoader
    from gigapose_tpu.parallel.mesh import best_dp_mesh, make_mesh
    from gigapose_tpu.training.loop import FitConfig, fit
    from gigapose_tpu.training.state import OptimConfig
    from gigapose_tpu.utils.config import load_config

    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = load_config("train", overrides)

    root = osp.join(cfg.machine.root_dir, "datasets")
    # one or several training datasets (the reference trains gso + shapenet
    # together, summing losses per step — train.py:60, gigaPose.py:262;
    # we interleave their batches round-robin, same data mix in expectation)
    names = cfg.get("train_dataset_name") or (
        "gso" if cfg.train_dataset_id == 0 else "shapenet"
    )
    ds_names = [n.strip() for n in str(names).split(",") if n.strip()]
    ds = ds_names[0]
    save_dir = cfg.get("save_dir") or osp.join(
        cfg.machine.root_dir, "results", f"{cfg.model.model_name}_{cfg.run_id}"
    )
    os.makedirs(save_dir, exist_ok=True)

    def make_loader(name, seed):
        split_dir = osp.join(root, name, cfg.get("train_split") or "train_pbr")
        has_tar = osp.isdir(split_dir) and any(
            f.endswith(".tar") for f in os.listdir(split_dir)
        )
        source = (
            TarSceneSource(split_dir, depth_scale=cfg.data.depth_scale)
            if has_tar
            else DirSceneSource(split_dir)
        )
        n_cpu = os.cpu_count() or 1
        return TrainLoader(
            scene_source=source,
            template_dir=osp.join(root, "templates", name),
            batch_size=cfg.machine.batch_size,
            template_scale_factor=cfg.data.template.scale_factor,
            seed=seed,
            # honor machine.num_workers, capped to the host (1-core box ->
            # sequential path; ref: 10 DataLoader workers, machine/local.yaml)
            num_workers=max(1, min(int(cfg.machine.get("num_workers") or 1),
                                   n_cpu - 1 if n_cpu > 1 else 1)),
        )

    # per-process disjoint data streams: the webdataset split_by_node
    # equivalent (reference webdataset pipelines shard by rank); each process
    # draws from an independent seed and feeds only its local batch rows
    loaders = [
        make_loader(n, cfg.seed + i + 1000003 * proc_id)
        for i, n in enumerate(ds_names)
    ]
    if len(loaders) == 1:
        loader = loaders[0]
    else:
        class _Interleaved:
            def __iter__(self_inner):
                its = [iter(l) for l in loaders]
                while its:
                    nxt = []
                    for it in its:
                        b = next(it, None)
                        if b is not None:
                            yield b
                            nxt.append(it)
                    its = nxt

        loader = _Interleaved()

    tiny = bool(int(os.environ.get("GIGAPOSE_TINY", "0")))
    if tiny:
        from gigapose_tpu.models.ae_net import AENet
        from gigapose_tpu.models.ist_net import ISTBackbone, ISTNet, Regressor

        ae = AENet(model_name="vit_tiny_test")
        ist = ISTNet(
            backbone=ISTBackbone(
                initial_dim=8, block_dims=(8, 8, 12, 16), descriptor_size=16,
                input_size=256,
            ),
            regressor=Regressor(hidden_dim=16),
        )
    else:
        from gigapose_tpu.models.ae_net import AENet
        from gigapose_tpu.models.ist_net import default_ist_net

        # model.ae_net.remat=true checkpoints each ViT block (activation
        # memory ~O(1) in depth; the standard knob for larger per-chip
        # batch); remat=dots_saveable keeps matmul outputs and recomputes
        # only the elementwise tail (less recompute at modest extra HBM)
        ae = AENet(model_name=cfg.model.ae_net.backbone,
                   remat=cfg.model.ae_net.get("remat") or False)
        ist = default_ist_net(cfg.model.ist_net.descriptor_size)

    optim = OptimConfig(
        ae_lr=cfg.model.optim.ae_lr,
        ist_lr=cfg.model.optim.ist_lr,
        weight_decay=cfg.model.optim.weight_decay,
        warm_up_steps=cfg.model.optim.warm_up_steps,
        nets_to_train=cfg.model.optim.nets_to_train,
    )
    # optional validation loader over a BOP val dataset (ref: ycbv val in
    # train.py:60; the val/matching metric is the regression gate)
    val_loader = None
    val_ds = cfg.get("val_dataset_name")
    if val_ds:
        val_split = osp.join(root, val_ds, cfg.get("val_split") or "test")
        if osp.isdir(val_split):
            val_loader = TrainLoader(
                scene_source=DirSceneSource(val_split),
                template_dir=osp.join(root, "templates", val_ds),
                batch_size=cfg.machine.batch_size,
                inplane_augmentation=False,
                rgb_augmentation=False,
                seed=cfg.seed + 1,
            )

    # LoFTR-style warm start of the IST backbone from a torch checkpoint
    # (reference train.py:82-88 via load_checkpoint; here the shape-checked
    # partial loader with torch->flax key remapping)
    warm_start = None
    ist_ckpt = cfg.get("pretrained_ist_path") or cfg.model.ist_net.get(
        "pretrained_weights"
    )
    if ist_ckpt:
        def warm_start(state, _path=str(ist_ckpt)):
            import torch

            from gigapose_tpu.utils.weight import partial_load_torch

            sd = torch.load(_path, map_location="cpu", weights_only=False)
            key = cfg.model.ist_net.get("checkpoint_key") or "state_dict"
            sd = sd.get(key, sd) if isinstance(sd, dict) else sd
            prefix = str(cfg.model.ist_net.get("pretrained_prefix") or "")
            params, stats, n = partial_load_torch(
                jax.tree_util.tree_map(lambda x: x, state.ist_params),
                sd,
                prefix=prefix,
                batch_stats=state.ist_batch_stats,
            )
            print(f"Warm-started IST from {_path}: {n} tensors loaded")
            return state._replace(ist_params=params, ist_batch_stats=stats)

    if n_proc > 1:
        # machine.batch_size is PER-PROCESS (the reference's per-GPU DDP
        # batch); the dp mesh spans every chip of every host and shards the
        # global batch_size x n_proc batch
        global_bs = cfg.machine.batch_size * n_proc
        if global_bs % jax.device_count() != 0:
            raise ValueError(
                f"global batch {global_bs} (= {cfg.machine.batch_size} x "
                f"{n_proc} processes) must divide over {jax.device_count()} "
                "devices"
            )
        mesh = make_mesh()
    else:
        mesh = best_dp_mesh(cfg.machine.batch_size)
    state = fit(
        ae,
        ist,
        loader,
        optim_cfg=optim,
        fit_cfg=FitConfig(
            max_steps=cfg.max_steps,
            log_every=cfg.log_every,
            checkpoint_every=cfg.checkpoint_every,
            ckpt_dir=osp.join(save_dir, "checkpoints"),
            val_every=int(cfg.get("val_every") or 0),
            log_dir=osp.join(save_dir, "logs"),
        ),
        mesh=mesh,
        seed=cfg.seed,
        resume=bool(cfg.get("resume")),
        val_loader=val_loader,
        warm_start=warm_start,
    )
    if proc_id == 0:
        print(
            f"Training done at step {int(state.step)}; "
            f"checkpoints in {save_dir}/checkpoints"
        )


if __name__ == "__main__":
    main()
