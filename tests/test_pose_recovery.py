"""recover_poses: oracle transcription of the reference's closed-form recovery
(ObjectPoseRecovery._forward_recovery, src/models/poses.py:26-101) plus a
synthetic geometric consistency check."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from gigapose_tpu.ops.pose_recovery import recover_poses


def oracle_recover(query_M, query_K, view_ids, pred_Ms, template_K, template_Ms,
                   template_poses):
    B, k = view_ids.shape
    out = np.zeros((B, k, 4, 4))
    for b in range(B):
        inv_qM = np.linalg.inv(query_M[b])
        inv_qK = np.linalg.inv(query_K[b])
        for i in range(k):
            v = view_ids[b, i]
            tp = template_poses[b, v].copy()
            tM = template_Ms[b, v]
            pM = pred_Ms[b, i]
            scale = np.linalg.norm(pM[:2, 0])
            R_inp = np.eye(3)
            R_inp[:2, :2] = pM[:2, :2] / scale
            R = R_inp @ tp[:3, :3]
            z_t = tp[2, 3]
            center_t = template_K[b] @ tp[:3, 3]
            center_t = center_t / center_t[2]
            chain = inv_qM @ pM @ tM
            center_q = chain @ center_t
            scale2d = np.linalg.norm(chain[:2, 0])
            focal_ratio = query_K[b][0, 0] / template_K[b][0, 0]
            z_q = (z_t / scale2d) * focal_ratio
            ray = inv_qK @ center_q
            ray = ray / ray[2]
            out[b, i, :3, :3] = R
            out[b, i, :3, 3] = ray * z_q
            out[b, i, 3, 3] = 1
    return out


def _rand_case(seed, B=4, k=3, V=8):
    rng = np.random.default_rng(seed)
    query_M = np.tile(np.eye(3), (B, 1, 1))
    query_M[:, 0, 0] = query_M[:, 1, 1] = rng.uniform(0.5, 2, B)
    query_M[:, :2, 2] = rng.uniform(-30, 30, (B, 2))
    query_K = np.tile(np.diag([600.0, 600.0, 1.0]), (B, 1, 1))
    query_K[:, 0, 2], query_K[:, 1, 2] = 320, 240
    template_K = np.tile(
        np.array([[572.4114, 0, 320], [0, 573.57043, 240], [0, 0, 1.0]]), (B, 1, 1)
    )
    template_Ms = np.tile(np.eye(3), (B, V, 1, 1))
    template_Ms[..., 0, 0] = template_Ms[..., 1, 1] = rng.uniform(0.5, 2, (B, V))
    template_Ms[..., :2, 2] = rng.uniform(-20, 20, (B, V, 2))
    template_poses = np.tile(np.eye(4), (B, V, 1, 1))
    template_poses[..., :3, :3] = Rotation.random(B * V, random_state=seed).as_matrix().reshape(B, V, 3, 3)
    template_poses[..., :3, 3] = rng.uniform(-0.05, 0.05, (B, V, 3))
    template_poses[..., 2, 3] = rng.uniform(0.3, 0.6, (B, V))
    view_ids = rng.integers(0, V, (B, k))
    angle = rng.uniform(0, 2 * np.pi, (B, k))
    scale = rng.uniform(0.5, 2.0, (B, k))
    pred_Ms = np.zeros((B, k, 3, 3))
    pred_Ms[..., 0, 0] = scale * np.cos(angle)
    pred_Ms[..., 0, 1] = -scale * np.sin(angle)
    pred_Ms[..., 1, 0] = scale * np.sin(angle)
    pred_Ms[..., 1, 1] = scale * np.cos(angle)
    pred_Ms[..., :2, 2] = rng.uniform(-15, 15, (B, k, 2))
    pred_Ms[..., 2, 2] = 1
    return query_M, query_K, view_ids, pred_Ms, template_K, template_Ms, template_poses


def test_recover_vs_oracle():
    args = _rand_case(0)
    want = oracle_recover(*args)
    got = recover_poses(*(jnp.asarray(a) for a in args))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-4)


def test_recover_identity_roundtrip():
    """If the query IS the template (identity affine, same crop, same K),
    the recovered pose must equal the template pose."""
    B, V = 2, 5
    rng = np.random.default_rng(1)
    K = np.tile(np.array([[572.4, 0, 320], [0, 573.5, 240], [0, 0, 1.0]]), (B, 1, 1))
    M = np.tile(np.eye(3), (B, 1, 1)) * 1.7
    M[:, 2, 2] = 1
    template_Ms = np.tile(M[:, None], (1, V, 1, 1))
    template_poses = np.tile(np.eye(4), (B, V, 1, 1))
    template_poses[..., :3, :3] = Rotation.random(B * V, random_state=2).as_matrix().reshape(B, V, 3, 3)
    template_poses[..., 2, 3] = 0.4
    view_ids = np.array([[0], [3]])
    pred_Ms = np.tile(np.eye(3), (B, 1, 1, 1))
    got = recover_poses(
        jnp.asarray(M), jnp.asarray(K), jnp.asarray(view_ids), jnp.asarray(pred_Ms),
        jnp.asarray(K), jnp.asarray(template_Ms), jnp.asarray(template_poses),
    )
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(got[b, 0]), template_poses[b, view_ids[b, 0]], atol=1e-5
        )
