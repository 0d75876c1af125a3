"""Minimal hydra-style config system: YAML groups + dotted CLI overrides.

The reference composes Hydra groups (configs/train.yaml etc., SURVEY §2 L7)
and exposes CLI overrides like `test_dataset_name=lmo run_id=3 use_multiple=1`.
Hydra/OmegaConf are not in this image, so this module provides the same
surface: a root YAML with a `defaults` list of group files, deep-merged, then
`key.path=value` overrides parsed from argv. Values parse as YAML scalars so
`max_num_dets_per_forward=4` is an int and `use_multiple=true` a bool.
"""

from __future__ import annotations

import copy
import os.path as osp
from typing import Any, Dict, List, Optional, Sequence

import yaml

CONFIG_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "configs")


class Config(dict):
    """dict with attribute access, recursively."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return Config(v) if isinstance(v, dict) and not isinstance(v, Config) else v

    def __setattr__(self, k, v):
        self[k] = v


def _deep_merge(base: Dict, over: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _set_dotted(cfg: Dict, dotted: str, value: Any):
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def load_config(
    name: str,
    overrides: Optional[Sequence[str]] = None,
    config_dir: str = CONFIG_DIR,
) -> Config:
    """Load configs/<name>.yaml, resolve its `defaults` group list, apply
    `key=value` overrides (a `group@...` override of a defaults entry is not
    needed — override the merged keys directly)."""
    path = osp.join(config_dir, f"{name}.yaml")
    with open(path) as f:
        root = yaml.safe_load(f) or {}
    cfg: Dict = {}
    for entry in root.pop("defaults", []):
        # entry like "model/large" (merged at group key) or {"model": "large"}
        if isinstance(entry, dict):
            ((group, fname),) = entry.items()
            sub_path = osp.join(config_dir, group, f"{fname}.yaml")
            with open(sub_path) as f:
                cfg = _deep_merge(cfg, {group: yaml.safe_load(f) or {}})
        else:
            sub_path = osp.join(config_dir, f"{entry}.yaml")
            with open(sub_path) as f:
                cfg = _deep_merge(cfg, yaml.safe_load(f) or {})
    cfg = _deep_merge(cfg, root)
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"Override must be key=value: {ov}")
        k, v = ov.split("=", 1)
        _set_dotted(cfg, k, yaml.safe_load(v))
    return Config(cfg)
