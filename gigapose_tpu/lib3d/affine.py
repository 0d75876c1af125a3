"""2D affine / homogeneous transform algebra, pure JAX.

Capability parity with the reference's torch helpers (src/lib3d/torch.py:7-101,
normalize_affine_transform at :156-176) but written batch-first so every function
broadcasts over arbitrary leading axes and is safe under jit/vmap.

Conventions:
- 3x3 row-major homogeneous matrices acting on column vectors [x, y, 1]^T.
- Crop matrices ("M") are axis-aligned similarities: M = [[s,0,tx],[0,s,ty],[0,0,1]].
- Points are (..., N, 2) with x, y order.
"""

from __future__ import annotations

import jax.numpy as jnp
from functools import partial

# pose/geometry matrices are tiny; always contract in full f32 so results
# do not drift with the backend's default (possibly bf16) matmul precision
einsum = partial(jnp.einsum, precision="highest")


def homogeneous(points: jnp.ndarray) -> jnp.ndarray:
    """(..., N, D) -> (..., N, D+1) by appending ones."""
    ones = jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
    return jnp.concatenate([points, ones], axis=-1)


def affine2d(rotation: jnp.ndarray, scale=None, translation=None) -> jnp.ndarray:
    """Build (..., 3, 3) affine from (..., 2, 2) rotation, (...,) scale, (..., 2) trans.

    Mirrors the semantics of the reference's `affine_torch` (src/lib3d/torch.py:7-27):
    the linear block is scale * rotation; translation fills the last column.
    """
    batch_shape = rotation.shape[:-2]
    lin = rotation
    if scale is not None:
        lin = lin * scale[..., None, None]
    if translation is None:
        translation = jnp.zeros(batch_shape + (2,), dtype=rotation.dtype)
    top = jnp.concatenate([lin, translation[..., :, None]], axis=-1)  # (..., 2, 3)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=rotation.dtype), batch_shape + (1, 3)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rotation2d(cos_sin: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) [cos, sin] -> (..., 2, 2) rotation matrix R(theta)."""
    c, s = cos_sin[..., 0], cos_sin[..., 1]
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def inverse_crop_affine(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of an axis-aligned crop similarity (ref: inverse_affine,
    src/lib3d/torch.py:47-64). Assumes M[...,0,1] == M[...,1,0] == 0 and equal
    diagonal scale; cheaper and better-conditioned than a generic 3x3 inverse."""
    scale = M[..., 0, 0]
    inv_scale = 1.0 / scale
    tx = -M[..., 0, 2] * inv_scale
    ty = -M[..., 1, 2] * inv_scale
    zeros = jnp.zeros_like(scale)
    ones = jnp.ones_like(scale)
    rows = jnp.stack(
        [
            jnp.stack([inv_scale, zeros, tx], axis=-1),
            jnp.stack([zeros, inv_scale, ty], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return rows


def apply_affine(M: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 3, 3) homogeneous transform to (..., N, 2) points.

    Leading axes of M and points broadcast. Perspective divide included so the
    same helper works for K-projections of 2D homogeneous points.
    """
    pts_h = homogeneous(points)  # (..., N, 3)
    out = einsum("...ij,...nj->...ni", M, pts_h)
    return out[..., :2] / out[..., 2:3]


def affine_scale(M: jnp.ndarray) -> jnp.ndarray:
    """Isotropic scale of an affine: norm of the first column of the 2x2 block
    (ref uses torch.norm(M[:, :2, 0]) e.g. src/lib3d/torch.py:131)."""
    return jnp.linalg.norm(M[..., :2, 0], axis=-1)


def normalize_affine(M: jnp.ndarray) -> jnp.ndarray:
    """Strip scale from the 2x2 linear block, zero the translation; returns the
    pure rotation embedded in a 3x3 (ref: normalize_affine_transform,
    src/lib3d/torch.py:156-176). Works on (..., 3, 3)."""
    scale = affine_scale(M)
    lin = M[..., :2, :2] / scale[..., None, None]
    batch_shape = M.shape[:-2]
    out = jnp.zeros_like(M)
    out = out.at[..., :2, :2].set(lin)
    out = out.at[..., 2, 2].set(jnp.ones(batch_shape, dtype=M.dtype))
    return out
