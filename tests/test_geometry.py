import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from gigapose_tpu.lib3d import (
    cos_sin,
    cos_sin_to_angle,
    project_points,
    unproject_points,
    euler_z_zxy,
    euler_z_zyx,
    relative_scale,
    relative_inplane,
    opencv_to_opengl,
    rotation_geodesic_deg,
    compute_inplane_deg,
)
from gigapose_tpu.lib3d.geometry import transform_points


def test_cos_sin_roundtrip():
    angles = jnp.linspace(0.01, 2 * np.pi - 0.01, 17)
    np.testing.assert_allclose(cos_sin_to_angle(cos_sin(angles)), angles, atol=1e-5)


def test_euler_z_zxy_matches_scipy():
    rng = np.random.default_rng(2)
    R = Rotation.random(32, random_state=3).as_matrix()
    expected = Rotation.from_matrix(R).as_euler("zxy")[:, 0]
    got = euler_z_zxy(jnp.asarray(R))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_euler_z_zyx_matches_scipy():
    R = Rotation.random(32, random_state=4).as_matrix()
    expected = Rotation.from_matrix(R).as_euler("zyx")[:, 0]
    got = euler_z_zyx(jnp.asarray(R))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_project_unproject_roundtrip():
    K = jnp.array([[[572.4114, 0, 320.0], [0, 573.57043, 240.0], [0, 0, 1.0]]])
    rng = np.random.default_rng(5)
    pts3d = rng.uniform(-0.1, 0.1, size=(1, 20, 3)).astype(np.float32)
    pts3d[..., 2] += 0.5
    pts2d = project_points(jnp.asarray(pts3d), K)
    # build a dense depth map holding each point's z at its (rounded) pixel
    depth = np.zeros((1, 480, 640), np.float32)
    px = np.asarray(pts2d).astype(int)
    depth[0, px[0, :, 1], px[0, :, 0]] = pts3d[0, :, 2]
    # re-lift from the integer pixel: matches reference's long() sampling
    lifted = unproject_points(jnp.asarray(px, jnp.float32), K, jnp.asarray(depth))
    # z exact; x/y within one pixel footprint of depth quantization
    np.testing.assert_allclose(lifted[..., 2], pts3d[..., 2], atol=1e-6)
    np.testing.assert_allclose(lifted[..., :2], pts3d[..., :2], atol=2.5e-3)


def test_relative_scale_inplane_match_reference_formula():
    """Cross-check against an independent numpy transcription of the published
    formula (ref: get_relative_scale_inplane, src/lib3d/torch.py:137-152)."""
    rng = np.random.default_rng(6)
    B = 16
    src_R = Rotation.random(B, random_state=7).as_matrix()
    tar_R = Rotation.random(B, random_state=8).as_matrix()
    src_pose = np.tile(np.eye(4), (B, 1, 1))
    tar_pose = np.tile(np.eye(4), (B, 1, 1))
    src_pose[:, :3, :3], tar_pose[:, :3, :3] = src_R, tar_R
    src_pose[:, 2, 3] = rng.uniform(0.3, 1.2, B)
    tar_pose[:, 2, 3] = rng.uniform(0.3, 1.2, B)
    src_K = np.tile(np.diag([572.4, 573.5, 1.0]), (B, 1, 1))
    tar_K = np.tile(np.diag([600.0, 600.0, 1.0]), (B, 1, 1))
    s_src = rng.uniform(0.5, 2.0, B)
    s_tar = rng.uniform(0.5, 2.0, B)
    src_M = np.tile(np.eye(3), (B, 1, 1)) * s_src[:, None, None]
    tar_M = np.tile(np.eye(3), (B, 1, 1)) * s_tar[:, None, None]
    src_M[:, 2, 2] = tar_M[:, 2, 2] = 1

    rel_scale = relative_scale(
        jnp.asarray(src_K), jnp.asarray(tar_K),
        jnp.asarray(src_pose), jnp.asarray(tar_pose),
        jnp.asarray(src_M), jnp.asarray(tar_M),
    )
    expected_scale = (
        (src_pose[:, 2, 3] / tar_pose[:, 2, 3]) * (s_tar / s_src)
        / (src_K[:, 0, 0] / tar_K[:, 0, 0])
    )
    np.testing.assert_allclose(rel_scale, expected_scale, rtol=1e-5)

    rel_inp = relative_inplane(jnp.asarray(src_pose), jnp.asarray(tar_pose))
    rel_R = tar_R @ np.transpose(src_R, (0, 2, 1))
    expected_inp = Rotation.from_matrix(rel_R).as_euler("zxy")[:, 0]
    expected_inp = (expected_inp + 2 * np.pi) % (2 * np.pi)
    np.testing.assert_allclose(rel_inp, expected_inp, atol=1e-5)


def test_opencv_to_opengl_involution():
    T = Rotation.random(4, random_state=9).as_matrix()
    pose = np.tile(np.eye(4), (4, 1, 1))
    pose[:, :3, :3] = T
    pose[:, :3, 3] = np.arange(12).reshape(4, 3)
    out = opencv_to_opengl(opencv_to_opengl(jnp.asarray(pose)))
    np.testing.assert_allclose(out, pose, atol=1e-6)


def test_rotation_geodesic_deg():
    R1 = np.eye(3)
    R2 = Rotation.from_euler("z", 45, degrees=True).as_matrix()
    d = rotation_geodesic_deg(jnp.asarray(R1), jnp.asarray(R2))
    np.testing.assert_allclose(d, 45.0, atol=1e-4)


def test_compute_inplane_recovers_pure_z_rotation():
    """If query = Rz(-a) @ template then compute_inplane returns a (the reference
    then verifies Rz(-a) @ template == query, src/lib3d/template_transform.py:27-36)."""
    template = Rotation.random(8, random_state=10).as_matrix()
    a = np.linspace(-170, 170, 8)
    Rz = Rotation.from_euler("z", (-a)[:, None], degrees=True).as_matrix()
    query = np.einsum("bij,bjk->bik", Rz, template)
    # delta = template @ query^T is a pure z-rotation by angle derivable as zyx[0]
    got = compute_inplane_deg(jnp.asarray(query), jnp.asarray(template))
    np.testing.assert_allclose(got, a, atol=1e-4)


def test_transform_points():
    T = np.eye(4)
    T[:3, 3] = [1, 2, 3]
    pts = jnp.zeros((1, 5, 3))
    out = transform_points(jnp.asarray(T)[None], pts)
    np.testing.assert_allclose(out, np.tile([1, 2, 3], (1, 5, 1)), atol=1e-6)
