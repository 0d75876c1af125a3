"""Megapose checkpoint-wired refiner: multiview cameras, checkpoint
round-trip through from_checkpoints, multiview refinement, and the
576-rotation coarse classifier (VERDICT r1 items 3, 5, 7)."""

import os

import numpy as np
import pytest

REF = "/root/reference"


# ---------------------------------------------------------------- multiview
def test_make_tco_multiview_single_view_is_identity():
    from gigapose_tpu.refiner.multiview import make_TCO_multiview

    rng = np.random.default_rng(0)
    TCO = np.tile(np.eye(4), (3, 1, 1))
    TCO[:, :3, 3] = rng.normal(0, 0.1, (3, 3)) + [0, 0, 0.6]
    out = make_TCO_multiview(TCO, TCO[:, :3, 3], n_views=1)
    assert out.shape == (3, 1, 4, 4)
    np.testing.assert_allclose(out[:, 0], TCO)


def test_make_tco_multiview_geometry():
    """Every virtual camera looks straight at the reference point from the
    same distance; view 0 is the original camera (pose_rigid.py semantics)."""
    from scipy.spatial.transform import Rotation
    from gigapose_tpu.refiner.multiview import make_TCO_multiview

    rng = np.random.default_rng(1)
    B = 4
    TCO = np.tile(np.eye(4), (B, 1, 1))
    TCO[:, :3, :3] = Rotation.random(B, random_state=3).as_matrix()
    TCO[:, :3, 3] = rng.normal(0, 0.05, (B, 3)) + [0, 0, 0.5]
    tCR = TCO[:, :3, 3].copy()

    for mtype, n_total in [("TCO+front_3views", 4), ("sphere_26views", 27)]:
        out = make_TCO_multiview(TCO, tCR, mtype, n_views=n_total)
        assert out.shape == (B, n_total, 4, 4)
        np.testing.assert_allclose(out[:, 0], TCO, atol=1e-12)
        radius = np.linalg.norm(tCR, axis=-1)
        # virtual views (v >= 1) look straight at the reference point; view 0
        # is the unmodified original camera (asserted above)
        for v in range(1, n_total):
            # reference point in camera-v coordinates: T_cv_o is the object
            # pose; the ref point is the object origin -> translation column
            r_v = out[:, v, :3, 3]
            # looks straight at it: x, y components vanish, z > 0 (in front)
            np.testing.assert_allclose(r_v[:, :2], 0.0, atol=1e-9)
            assert np.all(r_v[:, 2] > 0)
            # rigid: rotations stay orthonormal
            Rv = out[:, v, :3, :3]
            np.testing.assert_allclose(
                np.einsum("bij,bik->bjk", Rv, Rv), np.tile(np.eye(3), (B, 1, 1)),
                atol=1e-9,
            )
        # the first virtual offset is (0, 0, 0): same position as the
        # original camera, re-aimed -> distance to the ref point == radius
        np.testing.assert_allclose(out[:, 1, 2, 3], radius, atol=1e-9)


def test_make_tco_multiview_inplane_rotations():
    from gigapose_tpu.refiner.multiview import make_TCO_multiview

    TCO = np.tile(np.eye(4), (2, 1, 1))
    TCO[:, 2, 3] = 0.5
    out = make_TCO_multiview(
        TCO, TCO[:, :3, 3], "TCO+front_3views", n_views=4,
        remove_TCO_rendering=True, views_inplane_rotations=True,
    )
    # 3 virtual views x 4 in-plane rotations (original removed)
    assert out.shape == (2, 12, 4, 4)
    # the pi rotation of view 0: R' = Rz(pi) @ R
    Rz_pi = np.diag([-1.0, -1.0, 1.0])
    np.testing.assert_allclose(out[:, 2, :3, :3], Rz_pi @ out[:, 0, :3, :3],
                               atol=1e-9)


# ----------------------------------------------------- SO(3) grid + normals
def test_so3_grid_is_valid_rotations():
    from gigapose_tpu.refiner.so3_grid import load_so3_grid

    for n in (72, 576):
        g = load_so3_grid(n)
        assert g.shape == (n, 3, 3)
        np.testing.assert_allclose(
            np.einsum("nij,nik->njk", g, g), np.tile(np.eye(3), (n, 1, 1)),
            atol=1e-6,
        )
        np.testing.assert_allclose(np.linalg.det(g), 1.0, atol=1e-6)
        # deterministic grid: all rotations distinct
        flat = np.unique(np.round(g.reshape(n, 9), 5), axis=0)
        assert len(flat) == n


def test_rasterizer_normals_pass(tmp_path):
    from tests.test_rasterizer import _write_cube_ply
    from gigapose_tpu.render.rasterizer import Rasterizer

    mesh = str(tmp_path / "cube.ply")
    _write_cube_ply(mesh, size=0.08)
    r = Rasterizer(mesh)
    K = np.array([[572.4, 0, 320], [0, 573.5, 240], [0, 0, 1.0]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0, 0, 0.5]
    rgba, depth, nrm = r.render_full(K, pose, 640, 480, normals=True)
    fg = rgba[..., 3] > 0
    assert fg.sum() > 100
    n_fg = nrm[fg]
    # unit length on foreground, zero on background
    np.testing.assert_allclose(np.linalg.norm(n_fg, axis=-1), 1.0, atol=1e-5)
    assert np.all(nrm[~fg] == 0.0)
    # axis-aligned cube face seen head-on: normal is -z (towards camera)
    center_n = nrm[240, 320]
    np.testing.assert_allclose(center_n, [0, 0, -1], atol=1e-5)


# ------------------------------------------------- checkpoint round-trip
@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
def test_from_checkpoints_roundtrip_numerical(tmp_path):
    """A random-init torch model with the released checkpoint's exact key
    layout (backbone.* WideResNet34 + pose_fc / views_logits_head) loads
    through from_checkpoints and matches the torch forward numerically —
    the test_megapose_net pattern extended to the full wiring (VERDICT #3)."""
    import importlib.util
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_wide_resnet", os.path.join(REF, "src/megapose/models/wide_resnet.py")
    )
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    from tests.test_rasterizer import _write_cube_ply
    from gigapose_tpu.refiner.megapose_refiner import (
        MegaposeRefiner,
        MegaposeRefinerConfig,
    )

    width = 0.25
    n_inputs = 9  # 3 image + 3 render rgb + 3 normals (released layout)
    torch.manual_seed(0)

    class TorchPoseModel(torch.nn.Module):
        def __init__(self, head_name, head_dim):
            super().__init__()
            self.backbone = ref_mod.WideResNet34(n_inputs=n_inputs, width=width)
            setattr(self, head_name, torch.nn.Linear(
                int(512 * width), head_dim))
            self.head_name = head_name

        def forward(self, x):  # net_forward: pool the feature map, then head
            f = self.backbone(x).flatten(2).mean(dim=-1)
            return getattr(self, self.head_name)(f)

    refiner_t = TorchPoseModel("pose_fc", 9).eval()
    coarse_t = TorchPoseModel("views_logits_head", 1).eval()
    with torch.no_grad():
        for model in (refiner_t, coarse_t):
            for m in model.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.1)
                    m.running_var.uniform_(0.5, 1.5)

    rp = str(tmp_path / "refiner.pth.tar")
    cp = str(tmp_path / "coarse.pth.tar")
    torch.save({"state_dict": refiner_t.state_dict()}, rp)
    torch.save({"state_dict": coarse_t.state_dict()}, cp)

    mesh = str(tmp_path / "cube.ply")
    _write_cube_ply(mesh, size=0.08)
    ref = MegaposeRefiner.from_checkpoints(
        rp, cp, {1: mesh},
        config=MegaposeRefinerConfig(render_size=(60, 80), n_sample_points=8),
        width=width,
    )

    import jax.numpy as jnp

    x = np.random.default_rng(3).normal(size=(2, n_inputs, 60, 80)).astype(
        np.float32)
    with torch.no_grad():
        want_pose = refiner_t(torch.from_numpy(x)).numpy()
        want_logit = coarse_t(torch.from_numpy(x)).numpy()
    got_pose = np.asarray(ref.refiner_net.apply(ref.refiner_vars, jnp.asarray(x)))
    got_logit = np.asarray(ref.coarse_net.apply(ref.coarse_vars, jnp.asarray(x)))
    np.testing.assert_allclose(got_pose, want_pose, atol=3e-4)
    np.testing.assert_allclose(got_logit, want_logit, atol=3e-4)


# --------------------------------------------------------- e2e smoke tests
def _tiny_refiner(tmp_path, **cfg_kw):
    from tests.test_rasterizer import _write_cube_ply
    from gigapose_tpu.refiner.megapose_refiner import (
        MegaposeRefiner,
        MegaposeRefinerConfig,
    )

    mesh = str(tmp_path / "cube.ply")
    _write_cube_ply(mesh, size=0.08)
    cfg = MegaposeRefinerConfig(
        n_iterations=1, render_size=(30, 40), n_sample_points=8, **cfg_kw
    )
    return MegaposeRefiner.create({1: mesh}, config=cfg, width=0.125), mesh


def test_megapose_refiner_multiview_smoke(tmp_path):
    """Refine with n_rendered_views=4 (TCO + 3 front views, the reference's
    multi-view layout): the scorer path still sees one render, the refiner
    input carries 4 views x 6 channels (VERDICT missing #4)."""
    ref, _ = _tiny_refiner(tmp_path, n_rendered_views=4,
                           multiview_type="TCO+front_3views")
    assert ref.config.n_inputs == 3 + 4 * 6
    K = np.array([[572.4, 0, 320], [0, 573.5, 240], [0, 0, 1.0]], np.float32)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0.0, 0.0, 0.5]
    rgba, _ = ref.meshes.rasterizers[1].render(K, gt, 640, 480)
    img = rgba[..., :3].transpose(2, 0, 1).astype(np.float32)[None] / 255.0
    init = gt.copy()
    init[:3, 3] += [0.01, 0.0, 0.02]
    out, scores = ref.refine_batch(img, K[None], np.array([1]), init[None],
                                   n_iterations=1)
    assert out.shape == (1, 4, 4) and np.isfinite(out).all()
    assert 0.0 <= float(scores[0]) <= 1.0
    RtR = out[0, :3, :3].T @ out[0, :3, :3]
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-4)


def test_coarse_classifier_smoke(tmp_path):
    """576-grid classifier on a tiny 72-rotation grid: returns finite scores
    for every hypothesis and well-formed best poses (VERDICT #5 of missing)."""
    ref, _ = _tiny_refiner(tmp_path)
    K = np.array([[572.4, 0, 320], [0, 573.5, 240], [0, 0, 1.0]], np.float32)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0.0, 0.0, 0.5]
    rgba, _ = ref.meshes.rasterizers[1].render(K, gt, 640, 480)
    img = rgba[..., :3].transpose(2, 0, 1).astype(np.float32)[None] / 255.0
    ys, xs = np.where(rgba[..., 3] > 0)
    box = np.array([[xs.min(), ys.min(), xs.max(), ys.max()]], np.float32)
    best, scores = ref.classify_coarse(
        img, K[None], np.array([1]), box, top_k=2, chunk=24, grid_size=72
    )
    assert scores.shape == (1, 72) and np.isfinite(scores).all()
    assert best.shape == (1, 2, 4, 4)
    # autodepth init puts every hypothesis in front of the camera at a depth
    # that matches the box; z must be positive and near the true 0.5 m
    assert np.all(best[:, :, 2, 3] > 0.1)
    np.testing.assert_allclose(best[0, :, 2, 3], 0.5, rtol=0.5)
