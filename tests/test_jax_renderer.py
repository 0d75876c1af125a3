"""JAX alternative renderer backend vs the native C++ rasterizer.

The two backends implement the same contract and shading conventions
(native/rasterizer.cpp:236-329), so the C++ renderer is the oracle: depth
must agree to sub-mm on shared pixels, masks must be near-identical, shaded
colors and face normals must match where both hit. Parser coverage: ascii +
binary PLY and OBJ produce identical renders."""

import numpy as np
import pytest

from gigapose_tpu.render.jax_renderer import JaxRenderer, load_mesh
from gigapose_tpu.render.rasterizer import Rasterizer

from test_rasterizer import _write_cube_ply

K = np.array([[572.4114, 0, 320], [0, 573.57043, 240], [0, 0, 1.0]], np.float32)


def _K(w, h):
    """Intrinsics scaled from the 640x480 reference to a (w, h) viewport."""
    s = np.diag([w / 640.0, h / 480.0, 1.0]).astype(np.float32)
    return s @ K


def _pose(rx_deg=30.0, ry_deg=-20.0, z=0.4):
    from scipy.spatial.transform import Rotation

    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.from_euler("xy", [rx_deg, ry_deg], degrees=True).as_matrix()
    T[2, 3] = z
    return T


def _compare(ref, jx, K, pose, w=320, h=240):
    rgba_c, depth_c, nrm_c = ref.render_full(K, pose, w, h, normals=True)
    rgba_j, depth_j, nrm_j = jx.render_full(K, pose, w, h, normals=True)
    m_c = rgba_c[..., 3] > 0
    m_j = rgba_j[..., 3] > 0
    inter = m_c & m_j
    union = m_c | m_j
    assert inter.sum() / union.sum() > 0.99  # masks agree except edge pixels
    # depth: sub-mm agreement on shared pixels (mesh units are meters here)
    assert np.abs(depth_c[inter] - depth_j[inter]).max() < 5e-4
    # shaded color within a couple of grey levels (u8 rounding + f32 bary)
    dc = np.abs(
        rgba_c[inter][:, :3].astype(int) - rgba_j[inter][:, :3].astype(int)
    )
    assert np.percentile(dc, 99) <= 2
    # camera-space flat normals match (same orientation convention)
    dn = np.abs(nrm_c[inter] - nrm_j[inter]).max()
    assert dn < 1e-3


def test_matches_native_rasterizer(tmp_path):
    path = str(tmp_path / "cube.ply")
    _write_cube_ply(path, size=0.05)
    ref, jx = Rasterizer(path), JaxRenderer(path)
    np.testing.assert_allclose(jx.diameter, ref.diameter, rtol=1e-5)
    assert jx.num_vertices == ref.num_vertices
    np.testing.assert_allclose(jx.center, ref.center, atol=1e-7)
    for pose in [_pose(), _pose(70, 15, 0.3), np.diag([1.0, 1, 1, 1])]:
        if pose[2, 3] == 0:
            pose = pose.copy()
            pose[2, 3] = 0.5
        _compare(ref, jx, K, pose.astype(np.float32))


def test_grey_default_and_nan_guard(tmp_path):
    path = str(tmp_path / "grey.ply")
    _write_cube_ply(path, size=0.05, colors=False)
    jx = JaxRenderer(path)
    rgba, depth = jx.render(K, _pose(), 320, 240)
    m = rgba[..., 3] > 0
    assert m.any()
    # grey 200 albedo * headlight shade in [0.35, 1] -> [70, 200]
    assert rgba[m][:, :3].min() >= 69 and rgba[m][:, :3].max() <= 200
    # all three channels equal (no color cast)
    assert (rgba[m][:, 0] == rgba[m][:, 1]).all()

    bad = np.eye(4, dtype=np.float32)
    bad[0, 3] = np.nan
    rgba, depth, nrm = jx.render_full(K, bad, 64, 64)
    assert rgba.sum() == 0 and depth.sum() == 0 and nrm.sum() == 0


def test_parsers_agree(tmp_path):
    # ascii PLY vs binary PLY vs OBJ: same geometry -> same render
    p_ascii = str(tmp_path / "a.ply")
    p_bin = str(tmp_path / "b.ply")
    _write_cube_ply(p_ascii, size=0.06)
    _write_cube_ply(p_bin, size=0.06, binary=True)
    v1, f1, c1 = load_mesh(p_ascii)
    v2, f2, c2 = load_mesh(p_bin)
    np.testing.assert_allclose(v1, v2, atol=1e-7)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(c1, c2)

    p_obj = str(tmp_path / "c.obj")
    with open(p_obj, "w") as f:
        for v, c in zip(v1, c1):
            f.write(
                f"v {v[0]} {v[1]} {v[2]} {c[0]/255:.6f} {c[1]/255:.6f} {c[2]/255:.6f}\n"
            )
        for fc in f1:
            f.write(f"f {fc[0]+1} {fc[1]+1} {fc[2]+1}\n")
    v3, f3, c3 = load_mesh(p_obj)
    np.testing.assert_allclose(v3, v1, atol=1e-6)
    np.testing.assert_array_equal(f3, f1)
    assert np.abs(c3.astype(int) - c1.astype(int)).max() <= 1

    r_ply = JaxRenderer(p_ascii).render(_K(160, 120), _pose(), 160, 120)
    r_obj = JaxRenderer(p_obj).render(_K(160, 120), _pose(), 160, 120)
    assert np.abs(r_ply[0].astype(int) - r_obj[0].astype(int)).max() <= 1
    np.testing.assert_allclose(r_ply[1], r_obj[1], atol=1e-6)


def test_quad_fan_triangulation(tmp_path):
    # quad faces fan-triangulate like the native loader
    path = str(tmp_path / "quad.ply")
    s = 0.03
    verts = [(-s, -s, 0), (s, -s, 0), (s, s, 0), (-s, s, 0)]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 4\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("element face 1\nproperty list uchar int vertex_indices\n")
        f.write("end_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        f.write("4 0 1 2 3\n")
    _, faces, _ = load_mesh(path)
    assert faces.shape == (2, 3)
    jx = JaxRenderer(path)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 0.3
    rgba, depth = jx.render(_K(160, 120), pose, 160, 120)
    m = rgba[..., 3] > 0
    assert m.any()
    np.testing.assert_allclose(depth[m], 0.3, atol=1e-5)


def test_render_batch_matches_single(tmp_path):
    path = str(tmp_path / "cube.ply")
    _write_cube_ply(path, size=0.05)
    jx = JaxRenderer(path)
    poses = np.stack([_pose(), _pose(80, 40, 0.5), _pose(-30, 100, 0.35)])
    out = jx.render_batch(_K(160, 120), poses, 160, 120)
    for i, pose in enumerate(poses):
        rgba, depth = jx.render(_K(160, 120), pose, 160, 120)
        np.testing.assert_array_equal(np.asarray(out["rgba"][i]), rgba)
        np.testing.assert_allclose(np.asarray(out["depth"][i]), depth, atol=1e-6)


def test_template_views_disk_contract(tmp_path):
    from PIL import Image

    from gigapose_tpu.render.jax_renderer import render_template_views_jax

    path = str(tmp_path / "cube.ply")
    _write_cube_ply(path, size=0.05)  # meters -> unit inference kicks in
    out_dir = str(tmp_path / "views")
    n = render_template_views_jax(
        path, out_dir, K=_K(160, 120), level=0, width=160, height=120)
    assert n == 42
    rgba = np.asarray(Image.open(f"{out_dir}/000000.png"))
    depth = np.asarray(Image.open(f"{out_dir}/000000_depth.png"))
    assert rgba.shape == (120, 160, 4) and depth.dtype == np.uint16
    m = rgba[..., 3] > 0
    assert m.any()
    # depth is mm at ~400mm template radius
    assert 300 < depth[m].mean() < 500
