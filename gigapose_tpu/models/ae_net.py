"""AE network: ViT patch features, L2-normalized per patch.

Rebuild of the reference's AENet (src/models/network/ae_net.py:18-73): run the
DINOv2 backbone, take the pre-norm tokens without CLS, reshape to the patch
grid, L2-normalize over channels. The reference chunks batches through the
net in a Python loop (max_batch_size=64, forward_by_chunk) purely for memory;
here the caller controls batching (jit once, feed fixed-size batches; the
pipeline pads), so the chunk loop disappears.

Feature layout: (B, P, C) patch-major — the layout every downstream op
(matching, gather) consumes. P = (H/14) * (W/14).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import flax.linen as nn

from gigapose_tpu.models.vit import ViT, ViTConfig, VIT_CONFIGS


class AENet(nn.Module):
    model_name: str = "dinov2_vitl14"
    compute_dtype: str = None  # "bfloat16" -> bf16 matmuls (f32 LN/residual)
    tp_mesh: object = None  # (dp, mp) Mesh for tensor parallelism (parallel.tp)
    # checkpoint each block (training memory lever): False | True | a
    # jax.checkpoint_policies name, e.g. "dots_saveable" (see ViTConfig.remat)
    remat: object = False

    @property
    def cfg(self) -> ViTConfig:
        base = VIT_CONFIGS[self.model_name]
        if (
            self.compute_dtype != base.compute_dtype
            or self.tp_mesh is not base.tp_mesh
            or self.remat != base.remat
        ):
            base = dataclasses.replace(
                base,
                compute_dtype=self.compute_dtype,
                tp_mesh=self.tp_mesh,
                remat=self.remat,
            )
        return base

    @property
    def descriptor_size(self) -> int:
        return self.cfg.embed_dim

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, 3, H, W) preprocessed crops -> (B, P, C) L2-normalized features."""
        out = ViT(self.cfg, name="vit")(images)
        feats = out["x_prenorm"][:, 1:, :]  # drop CLS (ref: ae_net.py:65)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True).clip(1e-12)
