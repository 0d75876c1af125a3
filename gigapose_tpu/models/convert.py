"""Torch checkpoint -> flax params conversion.

The reference ships torch checkpoints (pretrained/gigaPose_v1.ckpt with
ae_net.dinov2_model.* / ist_net.* keys, loaded at src/utils/weight.py:9-52 and
test.py:77-79) and pulls DINOv2 backbones from torch hub. For parity runs, this
module converts those state dicts into our flax parameter pytrees. Supported
source layouts:

- "hub": facebookresearch/dinov2 state dicts (blocks.N.attn.qkv.*)
- "hf":  HuggingFace transformers Dinov2Model state dicts (separate q/k/v)
- gigapose checkpoints: full lightning state_dict with ae_net/ist_net prefixes

Everything is pure numpy; torch is only needed to unpickle .ckpt files.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _linear(w, b=None):
    out = {"kernel": _t(w).T}
    if b is not None:
        out["bias"] = _t(b)
    return out


def _conv(w, b=None):
    out = {"kernel": _t(w).transpose(2, 3, 1, 0)}  # OIHW -> HWIO
    if b is not None:
        out["bias"] = _t(b)
    return out


def _ln(w, b):
    return {"scale": _t(w), "bias": _t(b)}


def dinov2_hub_to_flax(sd: Mapping[str, np.ndarray], depth: int) -> Dict:
    """facebookresearch/dinov2 state dict -> params for models.vit.ViT."""
    p: Dict = {
        "cls_token": _t(sd["cls_token"]),
        "pos_embed": _t(sd["pos_embed"]),
        "patch_embed": _conv(
            sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"]
        ),
        "norm": _ln(sd["norm.weight"], sd["norm.bias"]),
    }
    if "register_tokens" in sd:
        p["register_tokens"] = _t(sd["register_tokens"])
    for i in range(depth):
        b = f"blocks.{i}."
        blk = {
            "norm1": _ln(sd[b + "norm1.weight"], sd[b + "norm1.bias"]),
            "attn": {
                "qkv": _linear(sd[b + "attn.qkv.weight"], sd[b + "attn.qkv.bias"]),
                "proj": _linear(sd[b + "attn.proj.weight"], sd[b + "attn.proj.bias"]),
            },
            "ls1": {"gamma": _t(sd[b + "ls1.gamma"])},
            "norm2": _ln(sd[b + "norm2.weight"], sd[b + "norm2.bias"]),
            "ls2": {"gamma": _t(sd[b + "ls2.gamma"])},
        }
        if b + "mlp.fc1.weight" in sd:
            blk["mlp"] = {
                "fc1": _linear(sd[b + "mlp.fc1.weight"], sd[b + "mlp.fc1.bias"]),
                "fc2": _linear(sd[b + "mlp.fc2.weight"], sd[b + "mlp.fc2.bias"]),
            }
        else:  # swiglu (vitg)
            blk["mlp"] = {
                "w12": _linear(sd[b + "mlp.w12.weight"], sd[b + "mlp.w12.bias"]),
                "w3": _linear(sd[b + "mlp.w3.weight"], sd[b + "mlp.w3.bias"]),
            }
        p[f"block{i}"] = blk
    return p


def dinov2_hf_to_flax(sd: Mapping[str, np.ndarray], depth: int) -> Dict:
    """HuggingFace transformers Dinov2Model state dict -> params for ViT."""
    p: Dict = {
        "cls_token": _t(sd["embeddings.cls_token"]),
        "pos_embed": _t(sd["embeddings.position_embeddings"]),
        "patch_embed": _conv(
            sd["embeddings.patch_embeddings.projection.weight"],
            sd["embeddings.patch_embeddings.projection.bias"],
        ),
        "norm": _ln(sd["layernorm.weight"], sd["layernorm.bias"]),
    }
    for i in range(depth):
        b = f"encoder.layer.{i}."
        qw = _t(sd[b + "attention.attention.query.weight"])
        kw = _t(sd[b + "attention.attention.key.weight"])
        vw = _t(sd[b + "attention.attention.value.weight"])
        qb = _t(sd[b + "attention.attention.query.bias"])
        kb = _t(sd[b + "attention.attention.key.bias"])
        vb = _t(sd[b + "attention.attention.value.bias"])
        p[f"block{i}"] = {
            "norm1": _ln(sd[b + "norm1.weight"], sd[b + "norm1.bias"]),
            "attn": {
                "qkv": {
                    "kernel": np.concatenate([qw, kw, vw], axis=0).T,
                    "bias": np.concatenate([qb, kb, vb], axis=0),
                },
                "proj": _linear(
                    sd[b + "attention.output.dense.weight"],
                    sd[b + "attention.output.dense.bias"],
                ),
            },
            "ls1": {"gamma": _t(sd[b + "layer_scale1.lambda1"])},
            "norm2": _ln(sd[b + "norm2.weight"], sd[b + "norm2.bias"]),
            "mlp": {
                "fc1": _linear(sd[b + "mlp.fc1.weight"], sd[b + "mlp.fc1.bias"]),
                "fc2": _linear(sd[b + "mlp.fc2.weight"], sd[b + "mlp.fc2.bias"]),
            },
            "ls2": {"gamma": _t(sd[b + "layer_scale2.lambda1"])},
        }
    return p


def ist_backbone_to_flax(sd: Mapping[str, np.ndarray], prefix: str = ""):
    """Reference ResNet (src/models/network/resnet.py:318-381) -> ISTBackbone
    params + batch_stats."""
    params: Dict = {}
    stats: Dict = {}

    def bn(tkey):
        return (
            {"scale": _t(sd[prefix + tkey + ".weight"]), "bias": _t(sd[prefix + tkey + ".bias"])},
            {"mean": _t(sd[prefix + tkey + ".running_mean"]), "var": _t(sd[prefix + tkey + ".running_var"])},
        )

    params["conv1"] = _conv(sd[prefix + "conv1.weight"])
    params["bn1"], stats["bn1"] = bn("bn1")
    for li in range(1, 5):
        for bi in range(2):
            name = f"layer{li}_{bi}"
            tp = f"layer{li}.{bi}."
            blk_p: Dict = {
                "conv1": _conv(sd[prefix + tp + "conv1.weight"]),
                "conv2": _conv(sd[prefix + tp + "conv2.weight"]),
            }
            blk_s: Dict = {}
            blk_p["bn1"], blk_s["bn1"] = bn(tp + "bn1")
            blk_p["bn2"], blk_s["bn2"] = bn(tp + "bn2")
            if prefix + tp + "downsample.0.weight" in sd:
                blk_p["down_conv"] = _conv(sd[prefix + tp + "downsample.0.weight"])
                blk_p["down_bn"], blk_s["down_bn"] = bn(tp + "downsample.1")
            params[name] = blk_p
            stats[name] = blk_s
    params["out_conv"] = _conv(sd[prefix + "layer4_outconv.weight"])
    return params, stats


def regressor_to_flax(sd: Mapping[str, np.ndarray], prefix: str = ""):
    """Reference Regressor MLPs (ist_net.py:123-163) -> Regressor params.
    Sequential indices 0/2/4 are the three Linear layers."""
    out: Dict = {}
    for head, name in [("scale_predictor", "scale"), ("inplane_predictor", "inplane")]:
        for j, fc in zip((0, 2, 4), ("fc1", "fc2", "fc3")):
            out[f"{name}_{fc}"] = _linear(
                sd[f"{prefix}{head}.{j}.weight"], sd[f"{prefix}{head}.{j}.bias"]
            )
    return out


def spatial_transformer_to_flax(sd: Mapping[str, np.ndarray], prefix: str = "",
                                depth: int = 1) -> Dict:
    """Reference SpatialTransformer (resnet.py:256-315) state dict ->
    models.ist_net.SpatialTransformer params."""
    g = lambda k: sd[prefix + k]
    p: Dict = {
        "norm": {"scale": _t(g("norm.weight")), "bias": _t(g("norm.bias"))},
        "proj_in": _conv(g("proj_in.weight"), g("proj_in.bias")),
        "proj_out": _conv(g("proj_out.weight"), g("proj_out.bias")),
    }
    for d in range(depth):
        b = f"transformer_blocks.{d}."
        blk: Dict = {}
        for attn in ("attn1", "attn2"):
            blk[attn] = {
                "to_q": {"kernel": _t(g(b + attn + ".to_q.weight")).T},
                "to_k": {"kernel": _t(g(b + attn + ".to_k.weight")).T},
                "to_v": {"kernel": _t(g(b + attn + ".to_v.weight")).T},
                "to_out": _linear(
                    g(b + attn + ".to_out.0.weight"), g(b + attn + ".to_out.0.bias")
                ),
            }
        for n in ("norm1", "norm2", "norm3"):
            blk[n] = _ln(g(b + n + ".weight"), g(b + n + ".bias"))
        blk["ff_proj"] = _linear(
            g(b + "ff.net.0.proj.weight"), g(b + "ff.net.0.proj.bias")
        )
        blk["ff_out"] = _linear(g(b + "ff.net.2.weight"), g(b + "ff.net.2.bias"))
        p[f"block{d}"] = blk
    return p


def gigapose_ckpt_to_flax(ckpt_path: str, depth: int):
    """Load a reference lightning checkpoint and convert both networks.

    Returns dict(ae=params, ist=(params, batch_stats)).
    """
    import torch

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    ae_sd = {
        re.sub(r"^ae_net\.dinov2_model\.", "", k): v
        for k, v in sd.items()
        if k.startswith("ae_net.dinov2_model.")
    }
    ae = {"vit": dinov2_hub_to_flax(ae_sd, depth)}
    bb_params, bb_stats = ist_backbone_to_flax(sd, prefix="ist_net.backbone.")
    reg = regressor_to_flax(sd, prefix="ist_net.regressor.")
    ist_params = {"backbone": bb_params, "regressor": reg}
    ist_stats = {"backbone": bb_stats}
    return {"ae": ae, "ist": (ist_params, ist_stats)}
