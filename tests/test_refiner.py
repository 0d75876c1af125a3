"""Refiner: op-level parity with torch transcriptions of the published math +
an end-to-end render-and-compare smoke with the native rasterizer."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from gigapose_tpu.refiner import ops as R


def test_ortho6d_matches_reference_formula():
    rng = np.random.default_rng(0)
    o6 = rng.normal(size=(16, 6)).astype(np.float32)
    got = np.asarray(R.rotation_from_ortho6d(jnp.asarray(o6)))
    # transcription of the published Gram-Schmidt (rotations.py:24-40)
    x = o6[:, :3] / np.linalg.norm(o6[:, :3], axis=1, keepdims=True)
    z = np.cross(x, o6[:, 3:])
    z = z / np.linalg.norm(z, axis=1, keepdims=True)
    y = np.cross(z, x)
    want = np.stack([x, y, z], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # proper rotations
    det = np.linalg.det(got)
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_pose_update_identity_is_noop():
    rng = np.random.default_rng(1)
    B = 8
    TCO = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    TCO[:, :3, :3] = Rotation.random(B, random_state=2).as_matrix()
    TCO[:, :3, 3] = rng.normal(size=(B, 3)) * 0.1
    TCO[:, 2, 3] = np.abs(TCO[:, 2, 3]) + 0.4
    K = np.tile(np.array([[600, 0, 320], [0, 600, 240], [0, 0, 1.0]], np.float32), (B, 1, 1))
    tCR = TCO[:, :3, 3].copy()
    vxvyvz = np.zeros((B, 3), np.float32)
    vxvyvz[:, 2] = 1.0  # relative depth multiplier 1
    out = R.pose_update_with_reference_point(
        jnp.asarray(TCO), jnp.asarray(K), jnp.asarray(vxvyvz),
        jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))), jnp.asarray(tCR),
    )
    np.testing.assert_allclose(np.asarray(out), TCO, atol=1e-5)


def test_pose_update_moves_reference_point():
    """vx shifts the reference point by vx/fx * z in camera x."""
    B = 1
    TCO = np.eye(4, dtype=np.float32)[None]
    TCO[:, 2, 3] = 0.5
    K = np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1.0]], np.float32)[None]
    tCR = TCO[:, :3, 3].copy()
    v = np.array([[50.0, 0.0, 1.0]], np.float32)
    out = np.asarray(
        R.pose_update_with_reference_point(
            jnp.asarray(TCO), jnp.asarray(K), jnp.asarray(v),
            jnp.asarray(np.eye(3, dtype=np.float32)[None]), jnp.asarray(tCR),
        )
    )
    np.testing.assert_allclose(out[0, 0, 3], 50 / 500 * 0.5, atol=1e-6)
    np.testing.assert_allclose(out[0, 2, 3], 0.5, atol=1e-6)


def test_normalize_T_reorthonormalizes():
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.from_euler("xyz", [0.3, -0.2, 0.5]).as_matrix() * 1.02
    T[:3, 3] = [0.1, -0.2, 0.6]
    out = np.asarray(R.normalize_T(jnp.asarray(T[None])))[0]
    RtR = out[:3, :3].T @ out[:3, :3]
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(out[:3, 3], T[:3, 3], atol=1e-7)


def test_get_K_crop_matches_torch_transcription():
    rng = np.random.default_rng(3)
    B = 6
    K = np.tile(np.array([[572.4, 0, 320], [0, 573.5, 240], [0, 0, 1.0]]), (B, 1, 1))
    boxes = np.zeros((B, 4))
    boxes[:, 0] = rng.uniform(0, 200, B)
    boxes[:, 1] = rng.uniform(0, 100, B)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(50, 300, B)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(50, 300, B)
    got = np.asarray(
        R.get_K_crop_resize(jnp.asarray(K), jnp.asarray(boxes), (480, 640), (160, 160))
    )
    # transcription of camera_geometry.py:70-115
    fw, fh = 160.0, 160.0
    cw = boxes[:, 2] - boxes[:, 0]
    ch = boxes[:, 3] - boxes[:, 1]
    cj = (boxes[:, 0] + boxes[:, 2]) / 2
    ci = (boxes[:, 1] + boxes[:, 3]) / 2
    cx = K[:, 0, 2] + (cw - 1) / 2 - cj
    cy = K[:, 1, 2] + (ch - 1) / 2 - ci
    sx, sy = fw / cw, fh / ch
    cx = (fw - 1) / 2 + sx * (cx - (cw - 1) / 2)
    cy = (fh - 1) / 2 + sy * (cy - (ch - 1) / 2)
    np.testing.assert_allclose(got[:, 0, 0], sx * K[:, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(got[:, 1, 1], sy * K[:, 1, 1], rtol=1e-5)
    np.testing.assert_allclose(got[:, 0, 2], cx, rtol=1e-5)
    np.testing.assert_allclose(got[:, 1, 2], cy, rtol=1e-5)


def test_crop_images_center_crop():
    """Cropping the full image box reproduces a plain resize; a sub-box picks
    the right region."""
    img = np.zeros((1, 3, 64, 64), np.float32)
    img[:, :, 16:48, 16:48] = 1.0
    box = np.array([[16.0, 16.0, 48.0, 48.0]])
    out = np.asarray(R.crop_images_to_boxes(jnp.asarray(img), jnp.asarray(box), (8, 8)))
    assert out.mean() > 0.95  # all inside the white square


def test_render_compare_refiner_smoke(tmp_path):
    from tests.test_rasterizer import _write_cube_ply
    from gigapose_tpu.refiner.refiner import RenderCompareRefiner, RefinerConfig

    mesh = str(tmp_path / "cube.ply")
    _write_cube_ply(mesh, size=0.08)
    ref = RenderCompareRefiner.create(
        {1: mesh}, config=RefinerConfig(n_iterations=2, render_size=(64, 64),
                                        n_sample_points=8),
        refiner_width=8, scorer_width=8,
    )
    # observed image: render the cube at a GT pose with the same rasterizer
    K = np.array([[572.4, 0, 320], [0, 573.5, 240], [0, 0, 1.0]], np.float32)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0.02, -0.01, 0.5]
    rgba, _ = ref.meshes.rasterizers[1].render(K, gt, 640, 480)
    img = rgba[..., :3].transpose(2, 0, 1).astype(np.float32)[None] / 255.0
    init = gt.copy()
    init[:3, 3] += [0.01, 0.005, 0.03]
    out, scores = ref.refine_batch(
        img, K[None], np.array([1]), init[None], n_iterations=2
    )
    assert out.shape == (1, 4, 4) and np.isfinite(out).all()
    assert 0.0 <= float(scores[0]) <= 1.0
    # rotation stays orthonormal through updates
    RtR = out[0, :3, :3].T @ out[0, :3, :3]
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-4)


def _cube_refiner(tmp_path, **cfg_kw):
    from tests.test_rasterizer import _write_cube_ply
    from gigapose_tpu.refiner.refiner import RenderCompareRefiner, RefinerConfig

    mesh = str(tmp_path / "cube.ply")
    _write_cube_ply(mesh, size=0.08)
    cfg = RefinerConfig(n_iterations=2, render_size=(64, 64),
                        n_sample_points=8, **cfg_kw)
    return RenderCompareRefiner.create({1: mesh}, config=cfg,
                                       refiner_width=8, scorer_width=8)


def _cube_scene(ref, b=1):
    K = np.array([[572.4, 0, 320], [0, 573.5, 240], [0, 0, 1.0]], np.float32)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0.02, -0.01, 0.5]
    rgba, _ = ref.meshes.rasterizers[1].render(K, gt, 640, 480)
    img = rgba[..., :3].transpose(2, 0, 1).astype(np.float32)[None] / 255.0
    init = gt.copy()
    init[:3, 3] += [0.01, 0.005, 0.03]
    return (np.repeat(img, b, 0), np.repeat(K[None], b, 0),
            np.ones(b, np.int64), np.repeat(init[None], b, 0))


def test_keep_best_init_shared_frame_guard(tmp_path):
    """keep_best_init contract: with a sound referee the refiner NEVER
    returns a pose worse-aligned than its input. Start from a PERFECT init;
    the untrained refiner net degrades it; a deterministic photometric
    referee (stand-in for the trained scorer, same calling convention)
    must keep the init. Exercises the shared-frame comparison plumbing —
    both candidates rendered in the init crop's frame (refiner.py
    keep_best block; the r4/r5 slow-gate incidents traced to comparing
    scores across DIFFERENT crop frames)."""
    import jax

    from gigapose_tpu.refiner.refiner import _as_f01

    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0.02, -0.01, 0.5]

    @jax.jit
    def photometric_score(scorer_vars, crops, renders):
        err = jnp.abs(crops - _as_f01(renders)).mean(axis=(1, 2, 3))
        return jnp.exp(-10.0 * err)

    def _degrade(ref):
        # the untrained pose_head is identity-init (network.py:72-77); bump
        # the vz-multiplier bias so every iteration pushes z 30% deeper —
        # a deterministic stand-in for a runaway-basin refiner
        import flax

        v = flax.core.unfreeze(ref.refiner_vars)
        b = v["params"]["pose_head"]["bias"]
        v["params"]["pose_head"]["bias"] = b.at[8].add(0.3)
        ref.refiner_vars = v
        return ref

    # guard off: the degrading net must actually move the pose (otherwise
    # the guarded assertion below would be vacuous)
    ref_off = _degrade(
        _cube_refiner(tmp_path, keep_best_init=False, pipeline_chunks=1)
    )
    img, K, labels, _ = _cube_scene(ref_off)
    out_off, _ = ref_off.refine_batch(img, K, labels, gt[None], n_iterations=2)
    assert np.abs(out_off[0] - gt).max() > 1e-3

    # guard on, photometric referee: init (perfectly aligned) wins
    ref_on = _degrade(
        _cube_refiner(tmp_path, keep_best_init=True, pipeline_chunks=1)
    )
    crop_step, update_step, _ = ref_on._device_steps()
    object.__setattr__(
        ref_on, "_steps_cache", (crop_step, update_step, photometric_score)
    )
    out_on, scores = ref_on.refine_batch(img, K, labels, gt[None],
                                         n_iterations=2)
    np.testing.assert_allclose(out_on[0], gt, atol=1e-4)
    assert float(scores[0]) > 0.5  # the aligned render's photometric score


def test_device_render_matches_host_render(tmp_path):
    """The stacked on-device mesh pack rasterizes the same images as the
    host C++ path (up to edge pixels — same bound as test_jax_renderer)."""
    from gigapose_tpu.refiner import device_render as DR

    ref = _cube_refiner(tmp_path)
    pack = ref._get_device_pack()
    K = np.tile(np.array([[572.4, 0, 60], [0, 573.5, 40], [0, 0, 1.0]],
                         np.float32), (2, 1, 1))
    TCO = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    TCO[:, :3, 3] = [[0.0, 0.0, 0.5], [0.02, -0.01, 0.45]]
    TCO[1, :3, :3] = Rotation.from_euler("xyz", [0.4, 0.3, -0.2]).as_matrix()
    host = ref.meshes.render_batch(np.array([1, 1]), TCO, K, (80, 120))
    rows = jnp.asarray(pack.rows_for(np.array([1, 1])))
    dev = np.asarray(DR.render_rgb(
        pack.verts[rows], pack.faces[rows], pack.colors[rows],
        jnp.asarray(K), jnp.asarray(TCO), (80, 120), pack.chunk,
    ))
    assert host.shape == dev.shape == (2, 3, 80, 120)
    assert (host > 0).any() and (dev > 0).any()
    diff = np.abs(host - dev)
    assert np.percentile(diff, 99) <= 2.5 / 255  # agree except edge pixels
    # foreground masks overlap almost entirely
    mh, md = host.sum(1) > 0, dev.sum(1) > 0
    assert (mh & md).sum() / max((mh | md).sum(), 1) > 0.98


def test_refine_batch_device_smoke(tmp_path):
    """renderer="device": the whole loop compiles into one XLA program and
    produces a valid pose + score, and agrees with the host backend at
    iteration count 0 of drift (same scorer on near-identical renders)."""
    ref = _cube_refiner(tmp_path, renderer="device")
    img, K, labels, init = _cube_scene(ref)
    out, scores = ref.refine_batch(img, K, labels, init, n_iterations=2)
    assert out.shape == (1, 4, 4) and np.isfinite(out).all()
    assert 0.0 <= float(scores[0]) <= 1.0
    RtR = out[0, :3, :3].T @ out[0, :3, :3]
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-4)


def test_host_u8_renders_bitwise_match_f32(tmp_path):
    """The u8 render upload is exact: u8/255 on device == the old f32 host
    conversion."""
    ref = _cube_refiner(tmp_path)
    K = np.array([[572.4, 0, 60], [0, 573.5, 40], [0, 0, 1.0]], np.float32)[None]
    TCO = np.eye(4, dtype=np.float32)[None]
    TCO[:, 2, 3] = 0.5
    u8 = ref.meshes.render_batch(np.array([1]), TCO, K, (64, 64),
                                 out_dtype=np.uint8)
    f32 = ref.meshes.render_batch(np.array([1]), TCO, K, (64, 64))
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(u8.astype(np.float32) / 255.0, f32)


def test_pipelined_matches_sequential(tmp_path):
    """pipeline_chunks splits the batch across threads without changing the
    result."""
    ref = _cube_refiner(tmp_path)
    img, K, labels, init = _cube_scene(ref, b=4)
    out_seq, s_seq = ref.refine_batch(img, K, labels, init, n_iterations=2)
    ref2 = _cube_refiner(tmp_path, pipeline_chunks=2)
    ref2.refiner_vars, ref2.scorer_vars = ref.refiner_vars, ref.scorer_vars
    out_pip, s_pip = ref2.refine_batch(img, K, labels, init, n_iterations=2)
    np.testing.assert_allclose(out_pip, out_seq, atol=1e-5)
    np.testing.assert_allclose(s_pip, s_seq, atol=1e-5)


def test_device_mesh_decimation(tmp_path):
    """Vertex-clustering decimation: face budget met, and the decimated
    render stays close to the exact one (mask IoU) at refine crop size."""
    import jax.numpy as jnp
    from bench import _write_sphere_ply
    from gigapose_tpu.refiner import device_render as DR

    mesh = str(tmp_path / "sphere.ply")
    _write_sphere_ply(mesh, radius_m=0.05, levels=3)  # 1280 faces
    full = DR.build_device_meshes({1: mesh}, {1: 1.0})
    dec = DR.build_device_meshes({1: mesh}, {1: 1.0}, max_faces=320)
    assert int((dec.faces[0].sum(axis=1) > 0).sum()) <= 320
    K = np.array([[572.4, 0, 80], [0, 573.5, 80], [0, 0, 1.0]], np.float32)[None]
    TCO = np.eye(4, dtype=np.float32)[None]
    TCO[:, 2, 3] = 0.4
    def render(pack):
        rows = jnp.asarray(pack.rows_for(np.array([1])))
        return np.asarray(DR.render_rgb(
            pack.verts[rows], pack.faces[rows], pack.colors[rows],
            jnp.asarray(K), jnp.asarray(TCO), (160, 160), pack.chunk))
    rf, rd = render(full), render(dec)
    mf, md = rf.sum(1) > 0, rd.sum(1) > 0
    assert mf.any()
    iou = (mf & md).sum() / max((mf | md).sum(), 1)
    assert iou > 0.93, iou


def test_crop_matmul_equals_gather_form():
    """The separable-matmul crop equals the direct roi_align gather form
    (including boxes that leave the image and degenerate sub-pixel boxes)."""

    def gather_crop(images, boxes, output_size, r):
        B, C, H, W = images.shape
        oh, ow = output_size
        out = np.zeros((B, C, oh, ow), np.float64)
        for b in range(B):
            x1, y1, x2, y2 = boxes[b]
            gx = x1 + (np.arange(ow * r) + 0.5) * (x2 - x1) / (ow * r)
            gy = y1 + (np.arange(oh * r) + 0.5) * (y2 - y1) / (oh * r)
            for i, yy in enumerate(gy):
                for j, xx in enumerate(gx):
                    y0 = int(np.floor(yy - 0.5)); x0 = int(np.floor(xx - 0.5))
                    wy = (yy - 0.5) - y0; wx = (xx - 0.5) - x0
                    acc = np.zeros(C)
                    for dy, wyv in ((0, 1 - wy), (1, wy)):
                        for dx, wxv in ((0, 1 - wx), (1, wx)):
                            yi, xi = y0 + dy, x0 + dx
                            if 0 <= yi < H and 0 <= xi < W:
                                acc += wyv * wxv * images[b, :, yi, xi]
                    out[b, :, i // r, j // r] += acc / (r * r)
        return out

    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, (2, 3, 12, 17)).astype(np.float32)
    boxes = np.array([
        [2.3, 1.1, 14.8, 10.2],   # interior
        [-4.0, -2.5, 9.0, 15.5],  # spills out of the image on all sides
    ], np.float32)
    for r in (1, 4):
        want = gather_crop(img, boxes, (5, 6), r)
        got = np.asarray(R.crop_images_to_boxes(
            jnp.asarray(img), jnp.asarray(boxes), (5, 6), sampling_ratio=r))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_crop_sampling_ratio_properties():
    """roi_align-style ratio-4 averaging: exact on constant regions and on
    linear gradients (averaging of bilinear samples preserves both)."""
    # constant region
    img = np.full((1, 1, 32, 32), 3.5, np.float32)
    box = np.array([[4.0, 4.0, 28.0, 28.0]])
    out = np.asarray(
        R.crop_images_to_boxes(jnp.asarray(img), jnp.asarray(box), (8, 8),
                               sampling_ratio=4)
    )
    np.testing.assert_allclose(out, 3.5, atol=1e-6)
    # horizontal gradient: bin average equals the gradient at the bin center
    gx = np.tile(np.arange(32, dtype=np.float32), (32, 1))[None, None]
    out = np.asarray(
        R.crop_images_to_boxes(jnp.asarray(gx), jnp.asarray(box), (8, 8),
                               sampling_ratio=4)
    )
    # bin centers along x: 4 + (i+0.5)*3 ; gradient value = x - 0.5
    want = 4 + (np.arange(8) + 0.5) * 3 - 0.5
    np.testing.assert_allclose(out[0, 0, 4], want, atol=1e-4)
