"""Refiner / scorer networks in flax.

Rebuild of megapose's PosePredictor backbone+heads (reference:
src/megapose/models/pose_rigid.py:81-180 with ResNet-34/WideResNet backbones,
src/megapose/models/resnet.py, wide_resnet.py): a ResNet over the concatenated
(observed crop, rendered crop) channels, global-average-pooled, with

- RefinerNet: a 9-d "pose" head (ortho6d dR + vx vy vz), and
- CoarseScorerNet: a 1-d per-render classification logit (the coarse model's
  hypothesis-scoring mode the reference uses at test time,
  pose_estimator.py:219-320).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


class ResBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda n: nn.BatchNorm(use_running_average=not train, momentum=0.9, name=n)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1,
                    use_bias=False, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = norm("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, name="down")(x)
            x = norm("down_bn")(x)
        return nn.relu(x + y)


class RefinerBackbone(nn.Module):
    """ResNet-34-shaped trunk over NCHW inputs -> pooled feature vector."""

    width: int = 64
    blocks: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        x = nn.Conv(self.width, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n in enumerate(self.blocks):
            planes = self.width * (2**i)
            for j in range(n):
                x = ResBlock(planes, stride=2 if (i > 0 and j == 0) else 1,
                             name=f"layer{i+1}_{j}")(x, train)
        return jnp.mean(x, axis=(1, 2))  # global average pool


class RefinerNet(nn.Module):
    """(B, C_in, H, W) concat(observed, render) -> (B, 9) pose update."""

    width: int = 64
    blocks: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = RefinerBackbone(self.width, self.blocks, name="backbone")(x, train)
        out = nn.Dense(9, name="pose_head",
                       kernel_init=nn.initializers.zeros)(f)
        # bias so the initial prediction is the identity update:
        # ortho6d = x-axis/y-axis unit vectors, vz multiplier 1
        bias = jnp.array([1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0], x.dtype)
        return out + bias


class CoarseScorerNet(nn.Module):
    """(B, C_in, H, W) -> (B,) hypothesis logit (ref: forward_coarse_tensor,
    pose_rigid.py:652-680)."""

    width: int = 32
    blocks: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = RefinerBackbone(self.width, self.blocks, name="backbone")(x, train)
        return nn.Dense(1, name="logit_head")(f)[..., 0]
