"""Partial / shape-checked weight loading (ref: src/utils/weight.py:9-52).

The reference warm-starts the IST net from LoFTR's ResNet weights with key
remapping and silently skips mismatched shapes. `partial_load_torch` provides
the same capability for any torch state dict -> flax params tree: remap key
prefixes, convert conv/linear/batchnorm layouts, skip anything whose shape or
path doesn't line up (logged), and report what loaded.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import numpy as np

from gigapose_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _to_np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def torch_key_to_flax_path(key: str) -> Tuple[Tuple[str, ...], str]:
    """'layer1.0.conv1.weight' -> (('layer1_0', 'conv1'), 'kernel')-ish paths.

    Heuristics: '<mod>.<idx>.' pairs merge to '<mod>_<idx>'; 'weight' maps to
    'kernel' (converted by the caller based on rank), 'bias' stays,
    'running_mean'/'running_var' map to batch_stats 'mean'/'var',
    BatchNorm 'weight' maps to 'scale' (resolved by rank-1).
    """
    parts = key.split(".")
    leaf = parts[-1]
    mods: list[str] = []
    for p in parts[:-1]:
        if p.isdigit() and mods:
            mods[-1] = f"{mods[-1]}_{p}"
        else:
            mods.append(p)
    return tuple(mods), leaf


def partial_load_torch(
    flax_params: Dict,
    torch_sd: Mapping,
    prefix: str = "",
    batch_stats: Optional[Dict] = None,
) -> Tuple[Dict, Optional[Dict], int]:
    """Copy matching tensors from a torch state dict into (a copy of) the flax
    params tree. Returns (params, batch_stats, n_loaded)."""
    import copy

    params = copy.deepcopy(flax_params)
    stats = copy.deepcopy(batch_stats) if batch_stats is not None else None
    n_loaded = 0

    def lookup(tree, path):
        node = tree
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return None
            node = node[p]
        return node

    def assign(tree, path, leaf, value):
        node = tree
        for p in path:
            node = node[p]
        if leaf not in node:
            return False
        if tuple(node[leaf].shape) != tuple(value.shape):
            logger.info(
                f"skip {'.'.join(path)}/{leaf}: shape {value.shape} != "
                f"{tuple(node[leaf].shape)}"
            )
            return False
        node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
        return True

    for key, v in torch_sd.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        path, leaf = torch_key_to_flax_path(key)
        w = _to_np(v)
        if leaf == "weight":
            target = lookup(params, path)
            if target is None:
                continue
            if "kernel" in target:
                if w.ndim == 4:
                    w = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
                elif w.ndim == 2:
                    w = w.T
                if assign(params, path, "kernel", w):
                    n_loaded += 1
            elif "scale" in target:  # norm layer
                if assign(params, path, "scale", w):
                    n_loaded += 1
        elif leaf == "bias":
            if lookup(params, path) is not None and assign(params, path, "bias", w):
                n_loaded += 1
        elif leaf in ("running_mean", "running_var") and stats is not None:
            name = "mean" if leaf == "running_mean" else "var"
            if lookup(stats, path) is not None and assign(stats, path, name, w):
                n_loaded += 1
    logger.info(f"partial_load_torch: loaded {n_loaded} tensors (prefix='{prefix}')")
    return params, stats, n_loaded
