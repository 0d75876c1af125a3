"""Host-side PIL RGB augmentations for training.

Capability parity with the reference's augmentation stack (configs/data/
transform.yaml:15-53 + src/megapose/datasets/augmentations.py:39-120):
gaussian blur / sharpness / contrast / brightness / color with the same
factor intervals and per-transform probabilities, all gated by an outer
probability of 0.8. Depth-noise and background-replacement augmentations the
reference carries are unused in GigaPose training and omitted.
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
