"""Checkpoint-compatible megapose refiner networks (flax).

The released megapose checkpoints (refiner-rgb-653307694 /
coarse-rgb-906902141; ref: src/megapose/utils/load_model.py:8-47) use a
pre-activation WideResNet backbone (BasicBlockV2, conv1 5x5/s2 + maxpool,
layers [3,4,6,3] or [2,2,2,2]; ref: src/megapose/models/wide_resnet.py) whose
feature map is average-pooled into linear heads ("pose" 9-d for the refiner,
"renderings_logits" for the coarse scorer; pose_rigid.py:117-132).

This module provides that exact architecture in flax plus the state-dict
converter, so the released torch weights load 1:1 (numerically validated in
tests against the reference torch module). RenderCompareRefiner can swap its
default nets for these when checkpoint parity is wanted.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn
import numpy as np

CONFIG = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}


class BasicBlockV2(nn.Module):
    """Pre-activation residual block (Identity Mappings, He et al. 2016)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda n: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                      epsilon=1e-5, name=n)
        out = nn.relu(norm("bn1")(x))
        residual = x
        if self.has_downsample:
            residual = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, name="downsample")(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1,
                      use_bias=False, name="conv1")(out)
        out = nn.relu(norm("bn2")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(out)
        return out + residual


class MegaposeWideResNet(nn.Module):
    """(B, C_in, H, W) NCHW -> pooled (B, n_features) like PosePredictor's
    net_forward (backbone feature map -> spatial mean)."""

    layers: Sequence[int] = CONFIG[34]
    width: float = 1.0
    pool: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = [int(v * self.width) for v in (64, 128, 256, 512)]
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        x = nn.Conv(dims[0], (5, 5), strides=(2, 2), padding=2, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         name="bn1")(x)
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        inplanes = dims[0]
        for li, (planes, n_blocks) in enumerate(zip(dims, self.layers), start=1):
            stride = 1 if li == 1 else 2
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                down = bi == 0 and (s != 1 or inplanes != planes)
                x = BasicBlockV2(planes, s, down, name=f"layer{li}_{bi}")(x, train)
                inplanes = planes
        if self.pool:
            return jnp.mean(x, axis=(1, 2))
        return jnp.transpose(x, (0, 3, 1, 2))


class MegaposePoseHeadNet(nn.Module):
    """Backbone + 9-d pose head (the refiner) or n-views logits (coarse)."""

    layers: Sequence[int] = CONFIG[34]
    width: float = 1.0
    head: str = "pose"  # "pose" | "renderings_logits"
    n_rendered_views: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = MegaposeWideResNet(self.layers, self.width, name="backbone")(x, train)
        if self.head == "pose":
            return nn.Dense(9, name="pose_fc")(f)
        return nn.Dense(self.n_rendered_views, name="views_logits_head")(f)


class TorchvisionBasicBlock(nn.Module):
    """Post-activation BasicBlock (torchvision v1): conv-bn-relu-conv-bn +
    (optional conv-bn downsample) -> relu."""

    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda n: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                      epsilon=1e-5, name=n)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1,
                    use_bias=False, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = norm("bn2")(y)
        if self.has_downsample:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, name="down_conv")(x)
            x = norm("down_bn")(x)
        return nn.relu(x + y)


class VanillaResNet34(nn.Module):
    """torchvision resnet34 with configurable input channels and an fc to
    n_features — the reference's 'vanilla_resnet34' coarse/refiner backbone
    option (pose_models_cfg.py:18-24)."""

    layers: Sequence[int] = CONFIG[34]
    n_features: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         name="bn1")(x)
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        inplanes = 64
        for li, n_blocks in enumerate(self.layers, start=1):
            planes = 64 * (2 ** (li - 1))
            stride = 1 if li == 1 else 2
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                down = bi == 0 and (s != 1 or inplanes != planes)
                x = TorchvisionBasicBlock(planes, s, down, name=f"layer{li}_{bi}")(
                    x, train
                )
                inplanes = planes
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        return nn.Dense(self.n_features, name="fc")(x)


def vanilla_resnet34_to_flax(sd: Mapping, prefix: str = "",
                             layers: Sequence[int] = CONFIG[34]) -> Tuple[Dict, Dict]:
    """torchvision resnet34 state dict -> VanillaResNet34 variables."""
    t = lambda k: np.asarray(
        sd[prefix + k].detach().cpu().numpy() if hasattr(sd[prefix + k], "detach")
        else sd[prefix + k]
    )

    def bn(key):
        return (
            {"scale": t(key + ".weight"), "bias": t(key + ".bias")},
            {"mean": t(key + ".running_mean"), "var": t(key + ".running_var")},
        )

    params: Dict = {"conv1": {"kernel": _conv(t("conv1.weight"))}}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = bn("bn1")
    for li, n_blocks in enumerate(layers, start=1):
        for bi in range(n_blocks):
            tp = f"layer{li}.{bi}"
            name = f"layer{li}_{bi}"
            p: Dict = {"conv1": {"kernel": _conv(t(tp + ".conv1.weight"))},
                       "conv2": {"kernel": _conv(t(tp + ".conv2.weight"))}}
            s: Dict = {}
            p["bn1"], s["bn1"] = bn(tp + ".bn1")
            p["bn2"], s["bn2"] = bn(tp + ".bn2")
            if prefix + tp + ".downsample.0.weight" in sd:
                p["down_conv"] = {"kernel": _conv(t(tp + ".downsample.0.weight"))}
                p["down_bn"], s["down_bn"] = bn(tp + ".downsample.1")
            params[name] = p
            stats[name] = s
    params["fc"] = {"kernel": t("fc.weight").T, "bias": t("fc.bias")}
    return params, stats


def _conv(w):
    return np.asarray(w).transpose(2, 3, 1, 0)


def megapose_backbone_to_flax(
    sd: Mapping, layers: Sequence[int] = CONFIG[34], prefix: str = "backbone."
) -> Tuple[Dict, Dict]:
    """Torch WideResNet state dict -> (params, batch_stats) for
    MegaposeWideResNet."""
    t = lambda k: np.asarray(
        sd[prefix + k].detach().cpu().numpy() if hasattr(sd[prefix + k], "detach")
        else sd[prefix + k]
    )
    params: Dict = {"conv1": {"kernel": _conv(t("conv1.weight"))},
                    "bn1": {"scale": t("bn1.weight"), "bias": t("bn1.bias")}}
    stats: Dict = {"bn1": {"mean": t("bn1.running_mean"), "var": t("bn1.running_var")}}
    for li, n_blocks in enumerate(layers, start=1):
        for bi in range(n_blocks):
            tp = f"layer{li}.{bi}."
            name = f"layer{li}_{bi}"
            p: Dict = {
                "bn1": {"scale": t(tp + "bn1.weight"), "bias": t(tp + "bn1.bias")},
                "conv1": {"kernel": _conv(t(tp + "conv1.weight"))},
                "bn2": {"scale": t(tp + "bn2.weight"), "bias": t(tp + "bn2.bias")},
                "conv2": {"kernel": _conv(t(tp + "conv2.weight"))},
            }
            s: Dict = {
                "bn1": {"mean": t(tp + "bn1.running_mean"), "var": t(tp + "bn1.running_var")},
                "bn2": {"mean": t(tp + "bn2.running_mean"), "var": t(tp + "bn2.running_var")},
            }
            if prefix + tp + "downsample.weight" in sd:
                p["downsample"] = {"kernel": _conv(t(tp + "downsample.weight"))}
            params[name] = p
            stats[name] = s
    return params, stats


def megapose_pose_model_to_flax(sd: Mapping, layers=CONFIG[34],
                                head: str = "pose") -> Tuple[Dict, Dict]:
    """Full PosePredictor state dict -> MegaposePoseHeadNet variables."""
    bb_params, bb_stats = megapose_backbone_to_flax(sd, layers)
    t = lambda k: np.asarray(
        sd[k].detach().cpu().numpy() if hasattr(sd[k], "detach") else sd[k]
    )
    params = {"backbone": bb_params}
    if head == "pose":
        params["pose_fc"] = {"kernel": t("pose_fc.weight").T, "bias": t("pose_fc.bias")}
    else:
        params["views_logits_head"] = {
            "kernel": t("views_logits_head.weight").T,
            "bias": t("views_logits_head.bias"),
        }
    return params, {"backbone": bb_stats}
