"""Native C++ rasterizer: geometric correctness against analytic projections."""

import os

import numpy as np
import pytest

from gigapose_tpu.render.rasterizer import Rasterizer, render_template_views

K = np.array([[572.4114, 0, 320], [0, 573.57043, 240], [0, 0, 1.0]], np.float32)


def _write_cube_ply(path, size=0.05, binary=False, colors=True):
    """Axis-aligned cube centered at origin, side `size` (meters), colored."""
    s = size / 2
    verts = np.array(
        [[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)], np.float32
    )
    # sign-asymmetric colors: every orientation is visually distinct
    cols = (verts / s * 100 + 128).astype(np.uint8)
    faces = [
        (0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),  # x faces
        (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),  # y faces
        (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3),  # z faces
    ]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v, c in zip(verts, cols):
            line = f"{v[0]} {v[1]} {v[2]}"
            if colors:
                line += f" {c[0]} {c[1]} {c[2]}"
            f.write(line + "\n")
        for fc in faces:
            f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")
    return verts


def test_render_cube_geometry(tmp_path):
    path = str(tmp_path / "cube.ply")
    _write_cube_ply(path, size=0.05)
    r = Rasterizer(path)
    np.testing.assert_allclose(r.diameter, 0.05 * np.sqrt(3), rtol=1e-5)
    assert r.num_vertices == 8

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 0.4  # 0.4 m in front of the camera
    rgba, depth = r.render(K, pose, 640, 480)

    alpha = rgba[..., 3] > 0
    assert alpha.any()
    ys, xs = np.nonzero(alpha)
    # projected extent: half-size 0.025 at z in [0.375, 0.425]
    cx, cy = xs.mean(), ys.mean()
    assert abs(cx - 320) < 2 and abs(cy - 240) < 2
    w = xs.max() - xs.min()
    want_w = 0.05 * 572.4114 / 0.375  # near face width in px
    assert abs(w - want_w) < 4, (w, want_w)
    # depth of the near face at the image center = 0.375 m
    np.testing.assert_allclose(depth[240, 320], 0.375, atol=2e-3)
    # background is transparent with zero depth
    assert rgba[0, 0, 3] == 0 and depth[0, 0] == 0


def test_render_pose_translation(tmp_path):
    path = str(tmp_path / "cube.ply")
    _write_cube_ply(path, size=0.05)
    r = Rasterizer(path)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.05, 0.0, 0.4]
    rgba, _ = r.render(K, pose, 640, 480)
    ys, xs = np.nonzero(rgba[..., 3])
    # x offset: 0.05 / 0.4 * f = 71.6 px
    assert abs(xs.mean() - (320 + 0.05 / 0.4 * 572.4114)) < 4


def test_render_template_views(tmp_path):
    path = str(tmp_path / "cube.ply")
    _write_cube_ply(path, size=50, colors=False)  # mm-unit mesh
    out = str(tmp_path / "views")
    n = render_template_views(path, out, level=0)
    assert n == 42
    files = os.listdir(out)
    assert len([f for f in files if f.endswith(".png") and "depth" not in f]) == 42
    assert len([f for f in files if f.endswith("_depth.png")]) == 42
    from PIL import Image

    rgba = np.asarray(Image.open(os.path.join(out, "000000.png")))
    depth = np.asarray(Image.open(os.path.join(out, "000000_depth.png")))
    assert rgba.shape == (480, 640, 4) and (rgba[..., 3] > 0).any()
    # object at 0.4 m -> depths around 400 mm
    d = depth[depth > 0]
    assert 300 < np.median(d) < 500


def test_normals_encoding_matches_reference_texture_semantics(tmp_path):
    """Software re-derivation of the reference's normals render encoding
    (PARITY known gap 2): megapose colors refiner renders by a 32^3 RGB
    texture indexed with MEyeNormal tex-gen coordinates under repeat wrap
    (panda3d_scene_renderer.py:214-223 + utils.make_rgb_texture_normal_map).
    Emulate that pipeline in numpy — texel value floor(frac(coord)*size)*255/size
    at the eye-frame normal — and check our continuous frac(nx, nz, -ny)
    encoding (refiner/refiner.py render_batch) agrees on every foreground
    pixel to within one texel quantization step (255/32/255 ~ 1/32)."""
    from gigapose_tpu.refiner.refiner import MeshStore

    path = str(tmp_path / "cube.ply")
    _write_cube_ply(path, size=0.05)
    store = MeshStore({1: path}, n_points=8)

    # a pose exposing three faces with distinct normals
    from scipy.spatial.transform import Rotation

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = Rotation.from_euler("xyz", [30, 40, 15], degrees=True).as_matrix()
    pose[2, 3] = 0.4
    Ks = K.copy()  # scale intrinsics from 640x480 to the 160x120 viewport
    Ks[0] *= 160 / 640
    Ks[1] *= 120 / 480
    out = store.render_batch(
        np.array([1]), pose[None], Ks[None], (120, 160), render_normals=True
    )
    enc = out[0, 3:]  # (3, H, W) our encoding
    fg = out[0, :3].sum(0) > 0

    # raw camera-space normals from the rasterizer directly
    r = store.rasterizers[1]
    rgba, _, nrm = r.render_full(Ks, pose, 160, 120, normals=True)
    fg_r = rgba[..., 3] > 0
    np.testing.assert_array_equal(fg, fg_r)

    # the cube shows at most 3 faces; every foreground normal must equal one
    # of the analytic rotated face normals
    face_normals = np.concatenate([pose[:3, :3].T, -pose[:3, :3].T], axis=0)
    n_px = nrm[fg_r]  # (N, 3)
    d = np.abs(n_px[:, None, :] - face_normals[None]).sum(-1)
    assert d.min(axis=1).max() < 1e-4, "rendered normals are not face normals"

    # emulate the reference's 3D texture sampling: panda eye frame is z-up
    # y-forward, so CV (x right, y down, z forward) -> (nx, nz, -ny)
    size = 32
    eye = np.stack([n_px[:, 0], n_px[:, 2], -n_px[:, 1]], axis=-1)
    wrapped = eye - np.floor(eye)  # repeat wrap
    texel = np.floor(np.clip(wrapped, 0, 1 - 1e-7) * size)
    ref_value = texel * 255.0 / size / 255.0  # uint8 texel / 255

    ours = enc.transpose(1, 2, 0)[fg]
    err = np.abs(ours - ref_value)
    assert err.max() <= 1.0 / size + 1e-6, err.max()
