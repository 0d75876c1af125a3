"""Batched square crop-resize-pad as pure XLA ops.

Rebuild of the reference's CropResizePad (src/utils/crop.py:11-74), which
loops detections in Python doing slice + interpolate + pad per image. Here the
whole batch is one fixed-shape inverse warp driven by the crop affine M, so it
jits and shards cleanly.

M convention (identical to the reference): out_pixel = M @ in_pixel, with
M = [[s, 0, -s*x0 + pad_left], [0, s, -s*y0 + pad_top], [0, 0, 1]] where
s = target_size / max(box_w, box_h) and pads center the short side. The pad
arithmetic reproduces the reference's floor/round behavior (interpolate with
scale_factor produces floor(dim * s) pixels; pad_top = (target - h')//2).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def crop_resize_affine(
    boxes_xyxy: jnp.ndarray, target_size: int = 224
) -> jnp.ndarray:
    """(B, 4) [x0, y0, x1, y1] -> (B, 3, 3) crop affine M (reference-exact).

    Boxes are integer pixel boxes (the reference indexes image[y0:y1, x0:x1]).
    """
    b = boxes_xyxy.astype(jnp.float32)
    w = b[..., 2] - b[..., 0]
    h = b[..., 3] - b[..., 1]
    scale = target_size / jnp.maximum(w, h)
    # reference: F.interpolate(scale_factor=s) -> floor(dim * s) output pixels
    out_w = jnp.floor(w * scale)
    out_h = jnp.floor(h * scale)
    square = (w == h)
    pad_left = jnp.where(square, 0.0, jnp.maximum(jnp.floor((target_size - out_w) / 2), 0.0))
    pad_top = jnp.where(square, 0.0, jnp.floor((target_size - out_h) / 2))
    tx = -b[..., 0] * scale + pad_left
    ty = -b[..., 1] * scale + pad_top
    zeros = jnp.zeros_like(scale)
    ones = jnp.ones_like(scale)
    return jnp.stack(
        [
            jnp.stack([scale, zeros, tx], axis=-1),
            jnp.stack([zeros, scale, ty], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )


def warp_affine_nearest(
    images: jnp.ndarray,
    M: jnp.ndarray,
    target_size: int = 224,
    fill: float = 0.0,
    bbox: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Inverse-warp images by crop affine M with nearest sampling.

    Args:
        images: (B, C, H, W).
        M:      (B, 3, 3) axis-aligned crop affines (out = M @ in).
        bbox:   optional (B, 4) xyxy; source pixels outside it read as `fill`
                (reproduces the reference's slice-then-resize, which never sees
                pixels outside the box).
    Returns (B, C, target_size, target_size).
    """
    B, C, H, W = images.shape
    ys = jnp.arange(target_size, dtype=jnp.float32)
    xs = jnp.arange(target_size, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (T, T)

    s = M[:, 0, 0][:, None, None]
    tx = M[:, 0, 2][:, None, None]
    ty = M[:, 1, 2][:, None, None]
    # nearest source pixel of each target pixel center (floor matches torch's
    # nearest interpolate: src = floor(dst / scale) for slice-origin crops)
    sx = jnp.floor((gx - tx) / s + 1e-6)
    sy = jnp.floor((gy - ty) / s + 1e-6)

    valid = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
    if bbox is not None:
        bx = bbox.astype(jnp.float32)
        valid &= (
            (sx >= bx[:, 0, None, None])
            & (sx < bx[:, 2, None, None])
            & (sy >= bx[:, 1, None, None])
            & (sy < bx[:, 3, None, None])
        )
    ix = jnp.clip(sx, 0, W - 1).astype(jnp.int32)
    iy = jnp.clip(sy, 0, H - 1).astype(jnp.int32)
    flat = images.reshape(B, C, H * W)
    idx = (iy * W + ix).reshape(B, 1, -1)
    out = jnp.take_along_axis(flat, jnp.broadcast_to(idx, (B, C, idx.shape[-1])), axis=2)
    out = out.reshape(B, C, target_size, target_size)
    return jnp.where(valid[:, None], out, fill)


def crop_resize_pad(
    images: jnp.ndarray, boxes_xyxy: jnp.ndarray, target_size: int = 224
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crop+resize+pad the batch to (B, C, T, T); returns (crops, M)."""
    M = crop_resize_affine(boxes_xyxy, target_size)
    crops = warp_affine_nearest(images, M, target_size, bbox=boxes_xyxy)
    return crops, M
