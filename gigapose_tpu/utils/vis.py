"""Visualization utilities (ref: src/libVis/torch.py:108-198, numpy.py, pil.py).

PIL/numpy based (no torchvision): keypoint-correspondence plots, Kabsch/affine
warp overlays, and template-retrieval grids — the reference's visual
regression artifacts logged during training/validation/testing
(gigaPose.py:274-282, 451-479, 615-633).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

from gigapose_tpu.pipeline.templates import RGB_MEAN, RGB_STD


def denormalize_rgb(img: np.ndarray) -> np.ndarray:
    """(3, H, W) CLIP-normalized -> (H, W, 3) uint8."""
    x = np.asarray(img)
    x = x * RGB_STD.reshape(3, 1, 1) + RGB_MEAN.reshape(3, 1, 1)
    return (np.clip(x, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)


def _color(i: int):
    palette = [
        (230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
        (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230),
    ]
    return palette[i % len(palette)]


def plot_keypoints(
    src_img: np.ndarray,
    tar_img: np.ndarray,
    src_pts: np.ndarray,
    tar_pts: np.ndarray,
    patch_size: int = 14,
    max_points: int = 64,
) -> Image.Image:
    """Side-by-side pair with matched patch centers connected by color
    (ref: plot_keypoints_batch). Points are patch coords, -1 invalid."""
    a = Image.fromarray(denormalize_rgb(src_img))
    b = Image.fromarray(denormalize_rgb(tar_img))
    W, H = a.size
    canvas = Image.new("RGB", (2 * W, H))
    canvas.paste(a, (0, 0))
    canvas.paste(b, (W, 0))
    draw = ImageDraw.Draw(canvas)
    valid = np.where((src_pts[:, 0] >= 0) & (tar_pts[:, 0] >= 0))[0]
    for j, i in enumerate(valid[:max_points]):
        sx, sy = (src_pts[i] * patch_size + patch_size / 2).tolist()
        tx, ty = (tar_pts[i] * patch_size + patch_size / 2).tolist()
        c = _color(j)
        draw.ellipse([sx - 2, sy - 2, sx + 2, sy + 2], fill=c)
        draw.ellipse([W + tx - 2, ty - 2, W + tx + 2, ty + 2], fill=c)
        draw.line([sx, sy, W + tx, ty], fill=c, width=1)
    return canvas


def plot_affine_warp(
    src_img: np.ndarray, tar_img: np.ndarray, M: np.ndarray
) -> Image.Image:
    """Warp the template crop by the RANSAC affine and blend over the query
    (ref: plot_Kabsch, libVis/torch.py:152-198)."""
    src = denormalize_rgb(src_img)
    tar = denormalize_rgb(tar_img)
    H, W = src.shape[:2]
    Minv = np.linalg.inv(np.asarray(M, np.float64))
    ys, xs = np.mgrid[0:H, 0:W]
    pts = np.stack([xs.ravel(), ys.ravel(), np.ones(H * W)], 0)
    spts = Minv @ pts
    sx = np.round(spts[0] / spts[2]).astype(int)
    sy = np.round(spts[1] / spts[2]).astype(int)
    ok = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
    warped = np.zeros_like(src)
    warped.reshape(-1, 3)[ok] = src[sy[ok], sx[ok]]
    blend = (0.5 * warped + 0.5 * tar).astype(np.uint8)
    out = Image.new("RGB", (3 * W, H))
    out.paste(Image.fromarray(src), (0, 0))
    out.paste(Image.fromarray(tar), (W, 0))
    out.paste(Image.fromarray(blend), (2 * W, 0))
    return out


def image_grid(images: Sequence[Image.Image], nrow: int = 8) -> Image.Image:
    """Tile PIL images into a grid (torchvision save_image equivalent)."""
    if not images:
        return Image.new("RGB", (1, 1))
    w, h = images[0].size
    ncol = (len(images) + nrow - 1) // nrow
    canvas = Image.new("RGB", (nrow * w, ncol * h))
    for i, img in enumerate(images):
        canvas.paste(img, ((i % nrow) * w, (i // nrow) * h))
    return canvas
