"""Orbax checkpointing of the train state (TPU-native replacement for the
reference's PL ModelCheckpoint every 1000 steps / save_last, SURVEY §5, and
the fs-based sync_model resume path)."""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional

import orbax.checkpoint as ocp

from gigapose_tpu.training.state import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int):
    """Multi-process: call on EVERY process with the (replicated, host-
    fetched) state — orbax runs its own cross-process barriers and writes
    from rank 0 only; the "last" pointer below is rank-0-guarded too."""
    path = osp.join(osp.abspath(ckpt_dir), f"step_{step:08d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    import jax

    if jax.process_index() == 0:
        # "last" pointer for resume (orbax's final barrier above means the
        # checkpoint is complete on disk before any process returns)
        with open(osp.join(ckpt_dir, "last"), "w") as f:
            f.write(path)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    p = osp.join(ckpt_dir, "last")
    if not osp.exists(p):
        return None
    path = open(p).read().strip()
    return path if osp.exists(path) else None


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=template)
    return restored
