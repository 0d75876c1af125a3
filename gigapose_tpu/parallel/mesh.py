"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL/DDP stack (SURVEY §2.8: PL strategy=ddp, torch.distributed
init, filesystem-based sync, per-rank gather).

Under JAX's single-controller SPMD model all of that collapses to:
- a 1-D data mesh ("dp") over however many chips are attached,
- NamedSharding annotations on the batch,
- replicated (or object-sharded) parameters/template stores,
- XLA-inserted collectives (psum for grad all-reduce) riding ICI.

Multi-host (the reference's SLURM path, train.py:40-45) is
jax.distributed.initialize + the same code; collectives cross DCN only at the
mesh boundaries JAX chooses. Nothing here is hand-scheduled.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("dp",)
) -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    devs = jax.devices()
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
    always pads to fixed batch sizes anyway)."""
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
