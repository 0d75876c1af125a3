"""Training loop: host loader -> device prep -> pjit'd step -> metrics/ckpt.

The reference's PL Trainer + LightningModule orchestration (train.py:20-104,
gigaPose.py:262-341) becomes this explicit loop. Data parallelism: params and
optimizer state replicated over the dp mesh, batch sharded on its leading
axis; XLA inserts the gradient all-reduce (the DDP/NCCL equivalent).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gigapose_tpu.dataloader.train_set import HostTrainRecords, prepare_train_batch
from gigapose_tpu.training import checkpoint as ckpt_lib
from gigapose_tpu.training.state import OptimConfig, TrainState, create_train_state, train_step
from gigapose_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclasses.dataclass
class FitConfig:
    max_steps: int = 1000
    log_every: int = 100
    checkpoint_every: int = 1000
    ckpt_dir: Optional[str] = None
    val_every: int = 0  # 0 disables
    log_dir: Optional[str] = None  # metrics.jsonl / tensorboard / vis pngs


def fit(
    ae_net,
    ist_net,
    loader: Iterable[HostTrainRecords],
    optim_cfg: OptimConfig = OptimConfig(),
    fit_cfg: FitConfig = FitConfig(),
    mesh: Optional[Mesh] = None,
    image_size: int = 224,
    seed: int = 2023,
    metrics_hook: Optional[Callable] = None,
    resume: bool = False,
    val_loader: Optional[Iterable[HostTrainRecords]] = None,
    warm_start: Optional[Callable[[TrainState], TrainState]] = None,
) -> TrainState:
    state, tx = create_train_state(
        ae_net, ist_net, jax.random.PRNGKey(seed), optim_cfg, image_size=image_size
    )
    if warm_start is not None:
        # e.g. LoFTR-pretrained IST backbone (reference train.py:82-88)
        state = warm_start(state)
    start_step = 0
    if resume and fit_cfg.ckpt_dir:
        last = ckpt_lib.latest_checkpoint(fit_cfg.ckpt_dir)
        if last:
            state = ckpt_lib.restore_checkpoint(last, state)
            start_step = int(state.step)
            logger.info(f"Resumed from {last} (step {start_step})")

    from gigapose_tpu.parallel import multihost
    from gigapose_tpu.parallel.mesh import shard_batch

    primary = multihost.is_primary()
    step_fn = functools.partial(train_step, ae_net, ist_net, tx, optim_cfg)
    prep_fn = jax.jit(prepare_train_batch, static_argnames=("target_size", "patch_size"))
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        # identical seed + identical warm-start/resume on every process ->
        # identical host values; replication is therefore value-correct
        # multi-host (the reference relies on DDP broadcasting rank-0 weights,
        # distributed.py; here every controller constructs the same state)
        state = jax.device_put(state, repl)
        # donate the state: params/opt-state buffers are reused in place,
        # halving the step's HBM high-water mark vs copy-on-update
        step_fn = jax.jit(step_fn, out_shardings=(repl, repl), donate_argnums=0)
        # each process preps ONLY its local rows; shard_batch assembles the
        # global (local_B x process_count) array from per-process shards
        put_batch = lambda b: shard_batch(b, mesh)
    else:
        step_fn = jax.jit(step_fn, donate_argnums=0)
        put_batch = lambda b: b

    def cycle(it: Iterable):
        """Epoch-cycle the loader until max_steps (the reference trains on
        infinite webdataset streams; finite sources just restart), with a
        background prefetch thread hiding host decode/augment latency."""
        from gigapose_tpu.utils.prefetch import prefetch

        while True:
            empty = True
            for x in prefetch(it, buffer_size=4):
                empty = False
                yield x
            if empty:
                return

    mlog = None
    if fit_cfg.log_dir and primary:  # process-0-only filesystem writes
        from gigapose_tpu.utils.metrics import MetricsLogger

        mlog = MetricsLogger(fit_cfg.log_dir)

    def run_validation(step):
        if val_loader is None:
            return
        from gigapose_tpu.training.validate import validation_metrics

        ae_params = {"params": state.ae_params}
        ist_vars = {
            "params": state.ist_params, "batch_stats": state.ist_batch_stats
        }
        agg, n = {}, 0
        for vrec in val_loader:
            vm = validation_metrics(
                ae_net, ist_net, ae_params, ist_vars, prep_fn(vrec)
            )
            for k, v in vm.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            n += 1
            if n >= 8:  # bounded validation pass
                break
        if n:
            vm = {k: v / n for k, v in agg.items()}
            logger.info(f"validation @ step {step}: {vm}")
            if mlog:
                mlog.log_scalars(step, vm)

    t0 = time.perf_counter()
    step = start_step
    for rec in cycle(loader):
        if step >= fit_cfg.max_steps:
            break
        batch = put_batch(prep_fn(rec))
        state, metrics = step_fn(state, batch)
        step += 1
        if step % fit_cfg.log_every == 0 or step == 1:
            m = {k: float(v) for k, v in metrics.items()}
            rate = (step - start_step) / (time.perf_counter() - t0)
            if primary:
                logger.info(f"step {step}: {m} ({rate:.2f} it/s)")
            if mlog:
                mlog.log_scalars(step, m)
            if metrics_hook:
                metrics_hook(step, m)
        if fit_cfg.val_every and step % fit_cfg.val_every == 0:
            run_validation(step)
        if fit_cfg.ckpt_dir and step % fit_cfg.checkpoint_every == 0:
            # every process calls save (orbax's Checkpointer does its own
            # cross-process syncs and rank-0 writes — calling it on a subset
            # deadlocks); the "last" pointer inside is process-0-guarded
            ckpt_lib.save_checkpoint(fit_cfg.ckpt_dir, jax.device_get(state), step)
    if fit_cfg.ckpt_dir:
        ckpt_lib.save_checkpoint(fit_cfg.ckpt_dir, jax.device_get(state), step)
    if val_loader is not None:
        run_validation(step)
    if mlog:
        mlog.close()
    return state
