import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigapose_tpu.lib3d import (
    affine2d,
    apply_affine,
    inverse_crop_affine,
    normalize_affine,
    affine_scale,
)
from gigapose_tpu.lib3d.affine import rotation2d


def _rand_crop_M(rng, n):
    scale = rng.uniform(0.5, 3.0, size=n)
    trans = rng.uniform(-50, 50, size=(n, 2))
    M = np.tile(np.eye(3), (n, 1, 1))
    M[:, 0, 0] = scale
    M[:, 1, 1] = scale
    M[:, :2, 2] = trans
    return M


def test_affine2d_builds_scaled_rotation():
    theta = jnp.array([0.3, -1.2])
    R = rotation2d(jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1))
    scale = jnp.array([2.0, 0.5])
    trans = jnp.array([[1.0, 2.0], [-3.0, 4.0]])
    M = affine2d(R, scale=scale, translation=trans)
    assert M.shape == (2, 3, 3)
    np.testing.assert_allclose(M[:, :2, :2], R * scale[:, None, None], rtol=1e-6)
    np.testing.assert_allclose(M[:, :2, 2], trans, rtol=1e-6)
    np.testing.assert_allclose(M[:, 2], np.array([[0, 0, 1.0]] * 2), rtol=1e-6)


def test_inverse_crop_affine_roundtrip():
    rng = np.random.default_rng(0)
    M = jnp.asarray(_rand_crop_M(rng, 8), dtype=jnp.float32)
    M_inv = inverse_crop_affine(M)
    eye = jnp.einsum("bij,bjk->bik", M, M_inv)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-4)


def test_apply_affine_matches_manual():
    rng = np.random.default_rng(1)
    M = jnp.asarray(_rand_crop_M(rng, 4), dtype=jnp.float32)
    pts = jnp.asarray(rng.uniform(0, 224, size=(4, 7, 2)), dtype=jnp.float32)
    out = apply_affine(M, pts)
    manual = np.einsum("bij,bnj->bni", np.asarray(M)[:, :2, :2], np.asarray(pts)) + (
        np.asarray(M)[:, None, :2, 2]
    )
    np.testing.assert_allclose(out, manual, rtol=1e-4, atol=1e-4)


def test_normalize_affine_strips_scale():
    theta = 0.7
    s = 2.5
    M = jnp.array(
        [
            [
                [s * np.cos(theta), -s * np.sin(theta), 5.0],
                [s * np.sin(theta), s * np.cos(theta), -2.0],
                [0, 0, 1.0],
            ]
        ]
    )
    N = normalize_affine(M)
    np.testing.assert_allclose(affine_scale(N), np.array([1.0]), rtol=1e-6)
    np.testing.assert_allclose(
        N[0, :2, :2],
        np.array(
            [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
        ),
        rtol=1e-5,
    )
    np.testing.assert_allclose(N[0, :2, 2], np.zeros(2), atol=1e-7)


def test_apply_affine_jit_and_vmap():
    M = jnp.eye(3)[None].repeat(3, axis=0)
    pts = jnp.ones((3, 5, 2))
    out = jax.jit(apply_affine)(M, pts)
    np.testing.assert_allclose(out, pts)
