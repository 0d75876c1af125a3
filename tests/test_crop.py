"""crop_resize_pad vs a torch transcription of the reference CropResizePad
(src/utils/crop.py:11-61): same M, near-identical pixels (nearest resampling)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gigapose_tpu.ops.crop import crop_resize_affine, crop_resize_pad
from gigapose_tpu.ops.gather import gather_patches, patch_index_to_location


def torch_oracle(images, boxes, target=224):
    """Oracle following the published crop algorithm (slice, nearest-resize by
    scale_factor, center-pad short side, final nearest-resize to target)."""
    out_M, out_img = [], []
    for i in range(len(boxes)):
        x0, y0, x1, y1 = boxes[i]
        img = torch.from_numpy(images[i][:, y0:y1, x0:x1])
        scale = target / max(x1 - x0, y1 - y0)
        M_crop = np.eye(3); M_crop[:2, 2] = [-x0, -y0]
        M_rs = np.eye(3); M_rs[0, 0] = M_rs[1, 1] = scale
        img = F.interpolate(img.unsqueeze(0), scale_factor=scale)[0]
        if img.shape[-1] / img.shape[-2] != 1:
            pad_top = (target - img.shape[-2]) // 2
            pad_bottom = max(target - img.shape[-2] - pad_top, 0)
            pad_left = max((target - img.shape[-1]) // 2, 0)
            pad_right = target - img.shape[-1] - pad_left
            img = F.pad(img, [pad_left, pad_right, pad_top, pad_bottom])
            M_rs[:2, 2] = [pad_left, pad_top]
        M = M_rs @ M_crop
        img = F.interpolate(img.unsqueeze(0), size=(target, target))[0]
        out_M.append(M)
        out_img.append(img.numpy())
    return np.stack(out_img), np.stack(out_M)


def _case(seed, B=4, H=480, W=640):
    rng = np.random.default_rng(seed)
    images = rng.uniform(size=(B, 3, H, W)).astype(np.float32)
    boxes = np.zeros((B, 4), np.int32)
    for i in range(B):
        w = rng.integers(40, 200)
        h = rng.integers(40, 200)
        x0 = rng.integers(0, W - w)
        y0 = rng.integers(0, H - h)
        boxes[i] = [x0, y0, x0 + w, y0 + h]
    boxes[0, 2] = boxes[0, 0] + (boxes[0, 3] - boxes[0, 1])  # square box path
    return images, boxes


def test_crop_M_matches_reference():
    images, boxes = _case(0)
    _, M_ref = torch_oracle(images, boxes)
    M = crop_resize_affine(jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(M), M_ref, atol=1e-4, rtol=1e-5)


def test_crop_pixels_close_to_reference():
    images, boxes = _case(1)
    img_ref, _ = torch_oracle(images, boxes)
    crops, _ = crop_resize_pad(jnp.asarray(images), jnp.asarray(boxes))
    # nearest-resample index rounding can differ by one source pixel at tile
    # borders; demand exact match for the overwhelming majority of pixels.
    same = np.isclose(np.asarray(crops), img_ref, atol=1e-6).mean()
    assert same > 0.95, f"only {same:.3%} pixels match the torch oracle"


def test_gather_patches():
    feats = jnp.arange(2 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 3)
    pts = jnp.array([[[0, 0], [3, 3], [-1, -1]], [[1, 2], [2, 1], [0, 3]]], jnp.float32)
    out, valid = gather_patches(feats, pts)
    assert out.shape == (2, 3, 3)
    np.testing.assert_array_equal(np.asarray(valid), [[True, True, False], [True, True, True]])
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(feats[0, 15]))
    np.testing.assert_allclose(np.asarray(out[1, 0]), np.asarray(feats[1, 2 * 4 + 1]))


def test_patch_index_location_roundtrip():
    idx = jnp.arange(256)
    loc = patch_index_to_location(idx, 16)
    back = (loc[:, 1] * 16 + loc[:, 0]).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(back), np.arange(256))


def test_gather_patches_onehot_bitexact():
    """The one-hot MXU gather (the TPU lowering of gather_patches) must be
    BIT-exact vs take_along_axis — values and gradients — since it silently
    replaces the gather on the tpu backend."""
    import jax
    import jax.numpy as jnp
    from gigapose_tpu.ops.gather import gather_patches_onehot

    rng = np.random.default_rng(3)
    for dtype in (jnp.float32, jnp.bfloat16):
        feats = jnp.asarray(rng.normal(size=(3, 16, 8)), dtype)
        pts = rng.integers(-1, 4, size=(3, 10, 2)).astype(np.float32)
        out_t, v_t = gather_patches(feats, pts)
        out_o, v_o = gather_patches_onehot(feats, pts)
        np.testing.assert_array_equal(np.asarray(v_t), np.asarray(v_o))
        np.testing.assert_array_equal(
            np.asarray(out_t, np.float32), np.asarray(out_o, np.float32)
        )

    # gradient wrt features: the one-hot transpose (a scatter-add) must equal
    # take_along_axis's gather transpose exactly, duplicates included
    feats = jnp.asarray(rng.normal(size=(2, 9, 4)), jnp.float32)
    pts = np.zeros((2, 6, 2), np.float32)
    pts[0, :3] = [[1, 1], [1, 1], [2, 0]]  # duplicate target accumulates
    pts[0, 3:] = -1
    pts[1, :] = [[0, 0], [1, 0], [2, 0], [0, 1], [1, 1], [-1, -1]]

    def loss(fn, f):
        out, valid = fn(f, jnp.asarray(pts))
        return jnp.sum(out * valid[..., None] * jnp.arange(1.0, 7.0)[None, :, None])

    g_t = jax.grad(lambda f: loss(gather_patches, f))(feats)
    g_o = jax.grad(lambda f: loss(gather_patches_onehot, f))(feats)
    np.testing.assert_array_equal(np.asarray(g_t), np.asarray(g_o))
