"""Host-side PIL/numpy augmentations for training.

Capability parity with the reference's full augmentation stack
(configs/data/transform.yaml:15-53 + src/megapose/datasets/
augmentations.py:39-431):

- RGB family (used by GigaPose training): gaussian blur / sharpness /
  contrast / brightness / color with the same factor intervals and
  per-transform probabilities, gated by an outer probability of 0.8.
- Depth-noise family (carried by the reference for megapose-style training):
  gaussian, GP-correlated gaussian, missing-pixel, full dropout, ellipse
  dropout/noise, blur, background dropout — numpy/PIL rebuilds of
  augmentations.py:121-390 (PIL ImageDraw replaces cv2.ellipse, PIL bicubic
  replaces cv2.INTER_CUBIC).
- Background replacement (augmentations.py:400-430) against any indexable
  image collection.

All functions take an explicit np.random.Generator for determinism.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter


@dataclasses.dataclass
class RgbAugmentConfig:
    p_any: float = 0.8
    p_blur: float = 0.4
    blur_interval: Tuple[int, int] = (1, 3)
    p_sharpness: float = 0.3
    sharpness_interval: Tuple[float, float] = (0.0, 50.0)
    p_contrast: float = 0.3
    contrast_interval: Tuple[float, float] = (0.2, 50.0)
    p_brightness: float = 0.5
    brightness_interval: Tuple[float, float] = (0.1, 6.0)
    p_color: float = 0.3
    color_interval: Tuple[float, float] = (0.0, 20.0)


def augment_rgb(
    rgb: np.ndarray, rng: np.random.Generator, cfg: RgbAugmentConfig = RgbAugmentConfig()
) -> np.ndarray:
    """(H, W, 3) uint8 -> augmented uint8."""
    if rng.uniform() > cfg.p_any:
        return rgb
    img = Image.fromarray(rgb)
    if rng.uniform() <= cfg.p_blur:
        img = img.filter(
            ImageFilter.GaussianBlur(int(rng.integers(cfg.blur_interval[0],
                                                      cfg.blur_interval[1] + 1)))
        )
    for p, interval, enhancer in [
        (cfg.p_sharpness, cfg.sharpness_interval, ImageEnhance.Sharpness),
        (cfg.p_contrast, cfg.contrast_interval, ImageEnhance.Contrast),
        (cfg.p_brightness, cfg.brightness_interval, ImageEnhance.Brightness),
        (cfg.p_color, cfg.color_interval, ImageEnhance.Color),
    ]:
        if rng.uniform() <= p:
            img = enhancer(img).enhance(float(rng.uniform(*interval)))
    return np.asarray(img)


# --------------------------------------------------------------------------
# depth-noise family (megapose-style training capability;
# ref: augmentations.py:121-390)


def depth_gaussian_noise(depth: np.ndarray, rng: np.random.Generator,
                         std_dev: float = 0.02) -> np.ndarray:
    """Additive gaussian noise on valid pixels (ref :131-142)."""
    out = depth.copy()
    noise = rng.normal(scale=std_dev, size=depth.shape)
    out[depth > 0] += noise[depth > 0]
    return np.clip(out, 0, np.finfo(np.float32).max)


def depth_correlated_gaussian_noise(
    depth: np.ndarray, rng: np.random.Generator, std_dev: float = 0.01,
    gp_rescale_factor: Tuple[float, float] = (15.0, 40.0),
) -> np.ndarray:
    """Spatially-correlated noise: low-res gaussian field upsampled bicubic
    (ref :145-177; PIL BICUBIC replaces cv2.INTER_CUBIC)."""
    H, W = depth.shape
    out = depth.copy()
    factor = rng.uniform(*gp_rescale_factor)
    small = rng.normal(0.0, std_dev, (max(int(H / factor), 1), max(int(W / factor), 1)))
    up = Image.fromarray(small.astype(np.float32)).resize((W, H), Image.BICUBIC)
    noise = np.asarray(up)
    out[depth > 0] += noise[depth > 0]
    return np.clip(out, 0, np.finfo(np.float32).max)


def depth_missing(depth: np.ndarray, rng: np.random.Generator,
                  max_missing_fraction: float = 0.2) -> np.ndarray:
    """Random per-pixel dropout of valid depth (ref :179-198)."""
    out = depth.copy()
    v, u = np.where(depth > 0)
    frac = rng.uniform(0, max_missing_fraction)
    drop = rng.choice(len(u), int(frac * len(u)), replace=False) if len(u) else []
    out[v[drop], u[drop]] = 0
    return out


def depth_dropout(depth: np.ndarray) -> np.ndarray:
    """Zero the whole depth image (ref :200-205)."""
    return np.zeros_like(depth)


def _random_ellipses(depth: np.ndarray, rng: np.random.Generator,
                     mean: float, gamma_shape: float, gamma_scale: float):
    n = rng.poisson(mean)
    nz = np.argwhere(depth > 0)
    if len(nz) == 0 or n == 0:
        return np.zeros((0,)), np.zeros((0,)), np.zeros((0,)), np.zeros((0, 2), int)
    centers = nz[rng.choice(len(nz), size=n)]
    xr = rng.gamma(gamma_shape, gamma_scale, size=n)
    yr = rng.gamma(gamma_shape, gamma_scale, size=n)
    angles = rng.integers(0, 360, size=n)
    return xr, yr, angles, centers


def _paint_ellipse(canvas: np.ndarray, center_vu, x_radius, y_radius,
                   angle_deg, value) -> None:
    """Filled rotated ellipse via PIL ImageDraw on a bounding patch (the
    cv2.ellipse replacement)."""
    from PIL import ImageDraw

    r = int(np.ceil(max(x_radius, y_radius))) + 1
    if r <= 0:
        return
    size = 2 * r + 1
    m = Image.new("L", (size, size), 0)
    d = ImageDraw.Draw(m)
    d.ellipse(
        (r - x_radius, r - y_radius, r + x_radius, r + y_radius), fill=255
    )
    m = m.rotate(-float(angle_deg), resample=Image.BILINEAR)
    mask = np.asarray(m) > 127
    v, u = int(center_vu[0]), int(center_vu[1])
    H, W = canvas.shape
    v0, v1 = max(v - r, 0), min(v + r + 1, H)
    u0, u1 = max(u - r, 0), min(u + r + 1, W)
    mv0, mu0 = v0 - (v - r), u0 - (u - r)
    sub = mask[mv0:mv0 + (v1 - v0), mu0:mu0 + (u1 - u0)]
    canvas[v0:v1, u0:u1][sub] = value


def depth_ellipse_dropout(
    depth: np.ndarray, rng: np.random.Generator, mean: float = 10.0,
    gamma_shape: float = 5.0, gamma_scale: float = 1.0,
) -> np.ndarray:
    """Drop random rotated ellipses to 0 (DexNet-style; ref :208-306)."""
    out = depth.copy()
    xr, yr, angles, centers = _random_ellipses(depth, rng, mean, gamma_shape,
                                               gamma_scale)
    for i in range(len(xr)):
        _paint_ellipse(out, centers[i], round(xr[i]), round(yr[i]), angles[i], 0.0)
    return out


def depth_ellipse_noise(
    depth: np.ndarray, rng: np.random.Generator, mean: float = 10.0,
    gamma_shape: float = 5.0, gamma_scale: float = 1.0, std_dev: float = 0.01,
) -> np.ndarray:
    """Additive constant-per-ellipse noise (ref :309-366)."""
    xr, yr, angles, centers = _random_ellipses(depth, rng, mean, gamma_shape,
                                               gamma_scale)
    vals = rng.normal(0.0, std_dev, size=len(xr))
    noise = np.zeros_like(depth)
    for i in range(len(xr)):
        _paint_ellipse(noise, centers[i], round(xr[i]), round(yr[i]), angles[i],
                       vals[i])
    out = depth.copy()
    out[depth > 0] += noise[depth > 0]
    return out


def depth_blur(depth: np.ndarray, rng: np.random.Generator,
               factor_interval: Tuple[int, int] = (3, 7)) -> np.ndarray:
    """Box blur (ref :368-377; cv2.blur == uniform box filter)."""
    k = int(rng.integers(factor_interval[0], factor_interval[1] + 1))
    # cv2.blur anchors the kernel at (k//2, k//2): the window for output
    # pixel i spans [i - k//2, i + (k-1)//2], so padding is asymmetric for
    # even k (k//2 before, (k-1)//2 after) — this keeps the output the same
    # shape as the input for every k, matching cv2.
    pad = ((k // 2, (k - 1) // 2), (k // 2, (k - 1) // 2))
    padded = np.pad(depth, pad, mode="edge").astype(np.float64)
    # separable box filter via cumulative sums
    c = np.cumsum(padded, axis=0)
    rows = (c[k - 1:] - np.concatenate([np.zeros((1, c.shape[1])), c[:-k]], 0))
    c2 = np.cumsum(rows, axis=1)
    out = (c2[:, k - 1:] - np.concatenate([np.zeros((c2.shape[0], 1)), c2[:, :-k]], 1))
    return (out / (k * k)).astype(depth.dtype)


def depth_background_dropout(depth: np.ndarray, segmentation: np.ndarray) -> np.ndarray:
    """Zero all background depth (ref :379-390)."""
    out = depth.copy()
    out[segmentation == 0] = 0
    return out


def replace_background(
    rgb: np.ndarray, segmentation: np.ndarray, backgrounds, rng: np.random.Generator
) -> np.ndarray:
    """Swap background pixels for a random image from an indexable collection
    of PIL images / arrays (ref ReplaceBackgroundTransform :400-420)."""
    out = rgb.copy()
    h, w = rgb.shape[:2]
    bg = backgrounds[int(rng.integers(0, len(backgrounds)))]
    if not isinstance(bg, Image.Image):
        bg = Image.fromarray(np.asarray(bg))
    bg = np.asarray(bg.convert("RGB").resize((w, h)))
    mask = segmentation == 0
    out[mask] = bg[mask]
    return out


def rotate_rgba(rgba: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate an RGBA (H, W, 4) uint8/float template image about its center
    (the reference's in-plane augmentation applies PIL Image.rotate to the
    loaded template, template_dataset.py open_image path)."""
    if angle_deg == 0:
        return rgba
    scale = 255.0 if rgba.dtype != np.uint8 else 1.0
    arr = (rgba * scale).astype(np.uint8) if rgba.dtype != np.uint8 else rgba
    out = np.asarray(Image.fromarray(arr, "RGBA").rotate(angle_deg))
    return out.astype(rgba.dtype) / scale if rgba.dtype != np.uint8 else out
