"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL/DDP stack (SURVEY §2.8: PL strategy=ddp, torch.distributed
init, filesystem-based sync, per-rank gather).

Under JAX's single-controller SPMD model all of that collapses to:
- a 1-D data mesh ("dp") over however many chips are attached,
- NamedSharding annotations on the batch,
- replicated (or object-sharded) parameters/template stores,
- XLA-inserted collectives (psum for grad all-reduce) riding ICI.

Multi-host (the reference's SLURM path, train.py:40-45) is wired in
`parallel/multihost.py`: env-driven jax.distributed.initialize in the entry
points, per-process local-shard batch assembly (shard_batch below routes
there when process_count > 1), process-0 filesystem guards, and a
2-process integration test (tests/test_multihost.py). Collectives cross DCN
only at the mesh boundaries JAX chooses. Nothing here is hand-scheduled.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("dp",),
    local: bool = False,
) -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all).
    local=True restricts to this process's devices — for multi-process
    inference where each process runs independent per-image computations."""
    devs = jax.local_devices() if local else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def data_parallel_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis across the dp mesh axis."""
    return NamedSharding(mesh, P("dp"))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params, template store) across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(tree, mesh: Mesh):
    """Put a pytree of batch arrays with sharded leading axis on the mesh.
    Leading axis must be divisible by the dp size (pad upstream; the pipeline
    always pads to fixed batch sizes anyway).

    Multi-process: the caller's tree is its LOCAL shard (per-process batch);
    the global array is assembled from every process's rows without
    cross-host transfers. Single-process: plain device_put."""
    if jax.process_count() > 1:
        from gigapose_tpu.parallel.multihost import global_batch_from_local

        return global_batch_from_local(tree, mesh)
    s = NamedSharding(mesh, P("dp"))
    return jax.device_put(tree, s)


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def best_dp_mesh(batch_size: int) -> Optional[Mesh]:
    """Largest dp mesh whose size divides batch_size (None when that is 1
    device — plain jit is simpler and equivalent)."""
    n = jax.device_count()
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n) if n > 1 else None
