"""Multi-host (multi-process) wiring — the TPU-native counterpart of the
reference's SLURM/NCCL multi-node stack.

Reference behavior being replaced:
- `/root/reference/train.py:40-45` sizes the world from SLURM env vars and
  hands PyTorch-Lightning `num_nodes`/`devices` for DDP;
- `src/megapose/utils/distributed.py:133-150` does the NCCL
  `init_process_group` (MASTER_ADDR/PORT, rank, world size);
- `src/megapose/utils/distributed.py:47-77` syncs processes through files on
  a shared filesystem.

Under JAX's multi-controller SPMD model all of that collapses to ONE call:
`jax.distributed.initialize` connects every process to a coordinator, after
which `jax.devices()` is the GLOBAL device list, a `Mesh` spans hosts, and
XLA inserts the cross-host collectives (DCN at mesh boundaries, ICI inside
a slice). The filesystem sync is `multihost_utils.sync_global_devices`;
per-rank gather is `jax.make_array_from_process_local_data`.

Process contract (mirrors the reference's DDP semantics):
- every process runs the same program;
- `machine.batch_size` is PER-PROCESS (like the reference's per-GPU batch,
  `configs/machine/slurm.yaml`); the global batch is batch_size x
  process_count and the dp mesh shards it;
- each process feeds ONLY its local shard (disjoint data streams, the
  webdataset `split_by_node` equivalent);
- checkpoint/csv/metrics writes happen on process 0 only.

Launch contract (env-driven, set by the cluster launcher):
  GIGAPOSE_COORDINATOR=host:port  GIGAPOSE_NUM_PROCESSES=N
  GIGAPOSE_PROCESS_ID=i           -> explicit initialize (any backend)
  GIGAPOSE_DISTRIBUTED=1          -> bare jax.distributed.initialize()
                                     (TPU pod / SLURM auto-detection)
Neither set -> single-process; every helper degrades to a no-op.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def maybe_initialize(env: Optional[dict] = None) -> tuple[int, int]:
    """Env-driven `jax.distributed.initialize`; call FIRST, before any
    backend touch (the reference calls init_process_group equally early,
    distributed.py:133). Idempotent. Returns (process_index, process_count).
    """
    global _initialized
    e = os.environ if env is None else env
    coord = e.get("GIGAPOSE_COORDINATOR")
    auto = e.get("GIGAPOSE_DISTRIBUTED") == "1"
    if not _initialized and (coord or auto):
        try:
            if coord:
                jax.distributed.initialize(
                    coordinator_address=coord,
                    num_processes=int(e["GIGAPOSE_NUM_PROCESSES"]),
                    process_id=int(e["GIGAPOSE_PROCESS_ID"]),
                )
            else:
                jax.distributed.initialize()
            _initialized = True
        except RuntimeError as exc:  # already initialized by the caller
            if "already" not in str(exc).lower():
                raise
            _initialized = True
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the process that owns filesystem writes (checkpoints, csv
    merge, metrics) — the reference's `get_rank() == 0` guards."""
    return jax.process_index() == 0


def global_batch_from_local(tree, mesh: Mesh, axis_name: str = "dp"):
    """Assemble a global batch from THIS process's local shard.

    Every process passes its own (local_batch, ...) host arrays; the result
    is a global jax.Array of shape (local_batch * process_count, ...) sharded
    P(axis_name) over the mesh — without any cross-host data movement (each
    device keeps the rows its own host produced). This is the multi-host
    replacement for `jax.device_put(batch, NamedSharding(mesh, P("dp")))`,
    which is only correct single-process.
    """

    def put(x):
        x = np.asarray(x)
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x
        )

    return jax.tree_util.tree_map(put, tree)


def split_work(items: Sequence, process_id: Optional[int] = None) -> list:
    """Round-robin slice of a work list for this process (inference images,
    objects to onboard). Round-robin rather than contiguous so scenes of
    uneven length balance (the reference splits webdataset shards by node)."""
    pi = jax.process_index() if process_id is None else process_id
    return list(items)[pi :: jax.process_count()]


def barrier(name: str = "gigapose") -> None:
    """Cross-process barrier (replaces the reference's filesystem sync,
    distributed.py:47-77). No-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
