"""Tensor parallelism for the ViT encoder — compiler-driven (GSPMD).

The reference scales only by data parallelism (PL strategy=ddp,
src/megapose/utils/distributed.py); on TPU the idiomatic extra axis is
tensor parallelism over the mesh's "mp" axis for the models whose weights
or activation working set outgrow one chip (ViT-g onboarding, large eval
batches). Following the scaling-book recipe, nothing is hand-scheduled:

- parameters get Megatron-style PartitionSpecs by name rule
  (`vit_tp_param_specs`): qkv/fc1/w12 kernels column-sharded (output dim on
  "mp"), proj/fc2/w3 kernels row-sharded (input dim on "mp"), their input
  biases sharded to match, everything else replicated;
- the attention reshape (B, N, 3C) -> (B, N, 3, H, hd) cannot carry a
  sharded 3C axis, so `models.vit.Attention` takes an optional `tp_mesh`
  and constrains the reshaped qkv to heads-on-"mp"
  (`with_sharding_constraint`) — the one activation annotation needed;
- XLA inserts the psum after row-sharded matmuls and any reshards.

Batch stays sharded on "dp": the same 2-D mesh serves dp-only (mp=1),
tp-only (dp=1), or both. Used by `__graft_entry__.dryrun_multichip` and
tested against the single-device forward on an 8-virtual-device CPU mesh
(tests/test_tp.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_mp_mesh(dp: int, mp: int, devices=None) -> Mesh:
    """2-D (dp, mp) mesh. "mp" is the fast (innermost) axis so model
    collectives ride neighboring-chip ICI links."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    assert devs.size >= dp * mp, f"need {dp * mp} devices, have {devs.size}"
    return Mesh(devs[: dp * mp].reshape(dp, mp), ("dp", "mp"))


# column-parallel Dense: kernel (in, out) -> out on mp; bias follows out.
_COL = {"qkv", "fc1", "w12"}
# row-parallel Dense: kernel (in, out) -> in on mp; bias replicated (added
# once after the psum).
_ROW = {"proj", "fc2", "w3"}


def _spec_for(path) -> P:
    names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
    leaf = names[-1]
    owner = names[-2] if len(names) >= 2 else None
    if owner in _COL:
        return P(None, "mp") if leaf == "kernel" else P("mp")
    if owner in _ROW and leaf == "kernel":
        return P("mp", None)
    return P()


def vit_tp_param_specs(params) -> Any:
    """PartitionSpec pytree for an AENet/ViT param tree (Megatron rules by
    module name; anything unrecognized is replicated)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(path), params
    )


def shard_params_tp(params, mesh: Mesh):
    """Place params on the mesh with TP specs (replicated across "dp")."""
    specs = vit_tp_param_specs(params)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )


def constrain_heads(x, tp_mesh: Optional[Mesh], head_axis: int = 3):
    """Constrain a (B, N, 3, H, hd) qkv tensor to heads-on-"mp" (no-op when
    tp is off). Called from models.vit.Attention."""
    if tp_mesh is None or "mp" not in tp_mesh.axis_names:
        return x
    spec = [None] * x.ndim
    if x.shape[head_axis] % tp_mesh.shape["mp"] == 0:
        spec[head_axis] = "mp"
    if (
        "dp" in tp_mesh.axis_names
        and tp_mesh.shape["dp"] > 1
        and x.shape[0] % tp_mesh.shape["dp"] == 0
    ):
        spec[0] = "dp"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(tp_mesh, P(*spec))
    )
