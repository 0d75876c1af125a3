"""Deterministic SO(3) hypothesis grids for the coarse classifier.

The reference's forward_coarse_model scores 576 rotation hypotheses per
detection drawn from a deterministic SO(3) grid
(/root/reference/src/megapose/inference/pose_estimator.py:322-480, grid loader
src/megapose/utils/transform_utils.py:27-50). The grids themselves are public
data from "Generating Uniform Incremental Grids on SO(3) Using the Hopf
Fibration" (Yershova et al.), distributed at lavalle.pl/software/so3/so3.html
as (x, y, z, w) quaternion tables; the 72/576-point tables are vendored under
assets/ unchanged (public data contract — the released megapose checkpoints'
hypothesis ids index into exactly this ordering).
"""

from __future__ import annotations

import os

import numpy as np

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")


def quat_xyzw_to_matrix(q: np.ndarray) -> np.ndarray:
    """(..., 4) unit quaternions in (x, y, z, w) order -> (..., 3, 3)."""
    q = np.asarray(q, np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3))
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - z * w)
    R[..., 0, 2] = 2 * (x * z + y * w)
    R[..., 1, 0] = 2 * (x * y + z * w)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - x * w)
    R[..., 2, 0] = 2 * (x * z - y * w)
    R[..., 2, 1] = 2 * (y * z + x * w)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def load_so3_grid(resolution: int = 576) -> np.ndarray:
    """(N, 3, 3) rotation matrices; N == resolution. Matches the reference's
    load_SO3_grid row ordering exactly."""
    path = os.path.join(_ASSET_DIR, f"so3_grid_{resolution}.qua")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no SO(3) grid asset for resolution {resolution} "
            f"(have: {sorted(os.listdir(_ASSET_DIR))})"
        )
    quats = np.loadtxt(path)
    assert quats.shape == (resolution, 4), quats.shape
    return quat_xyzw_to_matrix(quats)
