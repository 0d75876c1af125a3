"""Masked patch gathers — fixed-shape replacements for the reference's
compacting `gather` (src/utils/batch.py:46-73) and index<->location helpers
(src/models/matching.py:63-78).

The reference compacts gathered features to (sum(valid), C), which is a
dynamic shape. On TPU we keep (B, N, C) and return the validity mask; invalid
rows read patch (0, 0) (cheap, in-bounds) and must be masked by the consumer.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp


def patch_index_to_location(index: jnp.ndarray, num_patches: int) -> jnp.ndarray:
    """Flat patch index (...,) -> (..., 2) [x, y] grid location (float)."""
    h = index // num_patches
    w = index % num_patches
    return jnp.stack([w, h], axis=-1).astype(jnp.float32)


def patch_location_to_index(location: jnp.ndarray, num_patches: int) -> jnp.ndarray:
    """(..., 2) [x, y] -> flat index (...,) int32."""
    return (location[..., 1] * num_patches + location[..., 0]).astype(jnp.int32)


def gather_patches(
    features: jnp.ndarray, points: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather per-patch features at integer patch locations.

    Args:
        features: (B, P, C) patch-major features, P = H*W patches.
        points:   (B, N, 2) [x, y] patch coords; (-1, -1) marks invalid.
    Returns:
        (B, N, C) gathered features (invalid rows read patch 0) and
        (B, N) bool validity mask.
    """
    # Backend-adaptive: TPU lowers gather HLOs to dynamic-slice loops, so
    # route to the bit-exact one-hot MXU matmul there (its transpose — the
    # backward-pass scatter-add — is also a matmul). Explicit override for
    # A/B: GIGAPOSE_GATHER_IMPL=take|onehot.
    impl = os.environ.get("GIGAPOSE_GATHER_IMPL", "auto")
    if impl == "onehot" or (impl == "auto" and jax.default_backend() == "tpu"):
        return gather_patches_onehot(features, points)
    B, P, C = features.shape
    num_patches = int(round(P ** 0.5))
    x = points[..., 0].astype(jnp.int32)
    y = points[..., 1].astype(jnp.int32)
    valid = (x >= 0) & (y >= 0) & (x < num_patches) & (y < num_patches)
    # clamp so a grid-size mismatch can never read out of bounds (jax fills
    # OOB gathers with garbage/NaN); mismatched points are masked invalid
    idx = jnp.where(valid, y * num_patches + x, 0).clip(0, P - 1)
    out = jnp.take_along_axis(features, idx[..., None], axis=1)
    return out, valid


def gather_patches_onehot(
    features: jnp.ndarray, points: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """gather_patches via a one-hot MXU matmul instead of a gather HLO.

    TPU lowers `gather` to dynamic-slice loops; a (B, N, P) one-hot times
    (B, P, C) is a small batched matmul the MXU eats whole, and — the real
    win in TRAINING — its transpose (the scatter-add in the backward pass)
    is also just a matmul. Numerically exact for one-hot selection
    (weights are 0/1, f32 accumulate). Same contract as gather_patches.
    """
    B, P, C = features.shape
    num_patches = int(round(P ** 0.5))
    x = points[..., 0].astype(jnp.int32)
    y = points[..., 1].astype(jnp.int32)
    valid = (x >= 0) & (y >= 0) & (x < num_patches) & (y < num_patches)
    idx = jnp.where(valid, y * num_patches + x, 0).clip(0, P - 1)
    onehot = (idx[..., None] == jnp.arange(P)[None, None, :]).astype(
        features.dtype
    )
    out = jnp.einsum(
        "bnp,bpc->bnc", onehot, features,
        preferred_element_type=jnp.float32,
    ).astype(features.dtype)
    return out, valid
