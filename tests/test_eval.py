"""Native BOP19 / ModelNet evaluation stack.

Oracle strategy: the PoseCNN AUC is matched numerically against the
reference's own compute_auc_posecnn (megapose/evaluation/meters/utils.py,
AST-extracted because the module imports pandas, absent here); the BOP19
errors are pinned by analytic cases (exact pose -> 0, pure translation ->
its norm, symmetry-equivalent pose -> 0) and score_bop by a synthetic BOP
dataset scored end-to-end (gt csv -> AR 1.0, symmetry-rotated csv -> AR 1.0,
garbage csv -> AR ~0).
"""

import ast
import json
import os
import os.path as osp

import numpy as np
import pytest

from gigapose_tpu.dataloader import bop_io
from gigapose_tpu.eval import (
    add_error,
    adds_error,
    auc_posecnn,
    mspd_error,
    mssd_error,
    vsd_error,
)
from gigapose_tpu.eval.errors import angular_error_deg
from gigapose_tpu.eval.scorer import _greedy_recall, score_bop, symmetry_set

from test_rasterizer import _write_cube_ply

REF_UTILS = "/root/reference/src/megapose/evaluation/meters/utils.py"

K = np.array([[572.4114, 0, 320], [0, 573.57043, 240], [0, 0, 1.0]], np.float64)


def _rot(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.radians(deg)
    x, y, z = axis
    Kx = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    return np.eye(3) + np.sin(a) * Kx + (1 - np.cos(a)) * (Kx @ Kx)


# ---------------------------------------------------------------- AUC oracle


@pytest.mark.skipif(not osp.exists(REF_UTILS), reason="reference absent")
def test_auc_matches_reference_oracle():
    tree = ast.parse(open(REF_UTILS).read())
    fn = next(
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "compute_auc_posecnn"
    )
    ns = {"np": np}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), REF_UTILS, "exec"), ns)
    oracle = ns["compute_auc_posecnn"]

    rng = np.random.default_rng(0)
    cases = [
        rng.uniform(0, 0.2, size=20),
        rng.uniform(0, 0.05, size=7),  # all below the cap
        np.array([0.1]),  # exactly at the cap
        np.array([0.01]),
        rng.uniform(0.11, 1.0, size=5),  # nothing below the cap -> nan
    ]
    for errs in cases:
        ref = oracle(errs.copy())
        got = auc_posecnn(errs)
        if np.isnan(ref):
            assert np.isnan(got)
        else:
            assert got == pytest.approx(ref, abs=1e-12), errs


# ---------------------------------------------------------- analytic errors


def test_pose_errors_analytic():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(40, 3)).astype(np.float32) * 30.0
    R = _rot([0.3, -1.0, 0.2], 37.0)
    t = np.array([10.0, -5.0, 400.0])

    # exact pose -> all zero
    assert mssd_error(R, t, R, t, pts) == pytest.approx(0.0, abs=1e-3)
    assert mspd_error(R, t, R, t, pts, K) == pytest.approx(0.0, abs=1e-3)
    assert add_error(R, t, R, t, pts) == pytest.approx(0.0, abs=1e-3)
    assert adds_error(R, t, R, t, pts) == pytest.approx(0.0, abs=1e-2)

    # pure translation: mssd == add == |dt| for every point
    dt = np.array([3.0, -4.0, 0.0])  # norm 5
    assert mssd_error(R, t + dt, R, t, pts) == pytest.approx(5.0, rel=1e-4)
    assert add_error(R, t + dt, R, t, pts) == pytest.approx(5.0, rel=1e-4)

    # angular error
    assert angular_error_deg(R, R) == pytest.approx(0.0, abs=1e-3)
    assert angular_error_deg(_rot([0, 0, 1], 25.0) @ R, R) == pytest.approx(
        25.0, rel=1e-4
    )


def test_symmetry_aware_errors():
    # a z-symmetric point set (ring) + its 180deg-rotated estimate
    ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    pts = np.stack([np.cos(ang) * 20, np.sin(ang) * 20, np.zeros(8) + 5], 1)
    pts = pts.astype(np.float32)
    R_g = np.eye(3)
    t_g = np.array([0.0, 0.0, 300.0])
    R_e = _rot([0, 0, 1], 180.0)

    sym_R = np.stack([np.eye(3), _rot([0, 0, 1], 180.0)]).astype(np.float32)
    sym_t = np.zeros((2, 3), np.float32)

    # without the symmetry the error is the ring diameter; with it, ~0
    assert mssd_error(R_e, t_g, R_g, t_g, pts) == pytest.approx(40.0, rel=1e-3)
    assert mssd_error(R_e, t_g, R_g, t_g, pts, sym_R, sym_t) == pytest.approx(
        0.0, abs=1e-3
    )
    assert mspd_error(R_e, t_g, R_g, t_g, pts, K, sym_R, sym_t) == pytest.approx(
        0.0, abs=1e-2
    )
    # ADD-S is symmetry-robust by construction (closest-point matching)
    assert adds_error(R_e, t_g, R_g, t_g, pts) == pytest.approx(0.0, abs=1e-2)


def test_symmetry_set_continuous():
    # cylinder-like ring: continuous z symmetry; every generated transform
    # must map the ring onto itself (chamfer ~0)
    ang = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    verts = np.stack([np.cos(ang) * 30, np.sin(ang) * 30, ang * 0], 1)
    info = {
        "diameter": 60.0,
        "symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}],
    }
    sym_R, sym_t = symmetry_set(info, verts)
    assert sym_R.shape[0] >= 8  # discretized into multiple steps
    for R, t in zip(sym_R, sym_t):
        mapped = verts @ R.T + t
        d = np.linalg.norm(mapped[:, None] - verts[None], axis=-1).min(1)
        assert d.max() < 61.0 * 0.01 * 2 + 3.0  # within the disc step bound


def test_symmetry_set_bop_toolkit_exact():
    """Golden for bop_toolkit misc.get_symmetry_transformations exactness:
    fixed ceil(pi/0.01)=315 step count (mesh-INDEPENDENT — the old
    vertex-radius rule would give a different count for this near-axis
    mesh), 1..n-1 continuous steps with NO pure identity, t = o - R o,
    and cont∘disc composition order."""

    def axis_angle(axis, a):
        x, y, z = axis
        K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
        return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)

    n = int(np.ceil(np.pi / 0.01))  # 315
    offset = np.array([1.0, 2.0, 3.0])
    info = {
        "diameter": 60.0,
        "symmetries_continuous": [
            {"axis": [0, 0, 1], "offset": offset.tolist()}
        ],
    }
    # near-axis sliver mesh: the old radius rule would discretize this into
    # far fewer steps; bop_toolkit's count ignores the mesh entirely
    sliver = np.array([[0.01, 0, -30], [0.01, 0, 30], [0, 0.01, 0]])
    sym_R, sym_t = symmetry_set(info, sliver)
    assert sym_R.shape == (n - 1, 3, 3)  # 314: i = 1..314, no identity
    assert not any(np.allclose(R, np.eye(3), atol=1e-9) for R in sym_R)
    for k in (1, 7, 313):
        R_exp = axis_angle([0, 0, 1], 2.0 * np.pi * k / n)
        np.testing.assert_allclose(sym_R[k - 1], R_exp, atol=1e-6)
        np.testing.assert_allclose(
            sym_t[k - 1], offset - R_exp @ offset, atol=1e-4
        )

    # composition: one discrete sym D (rotation + translation); the combined
    # set is [cont_k ∘ I]*314 then [cont_k ∘ D]*314, R = R_c R_D,
    # t = R_c t_D + t_c (bop_toolkit's loop order and algebra)
    T = np.eye(4)
    T[:3, :3] = _rot([1, 0, 0], 180.0)
    T[:3, 3] = [5.0, -4.0, 2.0]
    info["symmetries_discrete"] = [T.flatten().tolist()]
    sym_R2, sym_t2 = symmetry_set(info, sliver)
    assert sym_R2.shape == (2 * (n - 1), 3, 3)
    k = 7
    R_c = axis_angle([0, 0, 1], 2.0 * np.pi * k / n)
    t_c = offset - R_c @ offset
    np.testing.assert_allclose(
        sym_R2[(n - 1) + (k - 1)], R_c @ T[:3, :3], atol=1e-5
    )
    np.testing.assert_allclose(
        sym_t2[(n - 1) + (k - 1)], R_c @ T[:3, 3] + t_c, atol=1e-4
    )

    # discrete-only objects DO keep the identity (first row)
    del info["symmetries_continuous"]
    sym_R3, _ = symmetry_set(info, sliver)
    assert sym_R3.shape == (2, 3, 3)
    np.testing.assert_allclose(sym_R3[0], np.eye(3), atol=1e-9)


def test_symmetry_set_discrete_composition():
    T = np.eye(4)
    T[:3, :3] = _rot([0, 0, 1], 180.0)
    info = {"diameter": 10.0, "symmetries_discrete": [T.flatten().tolist()]}
    sym_R, sym_t = symmetry_set(info, np.zeros((3, 3)))
    assert sym_R.shape == (2, 3, 3)
    assert np.allclose(sym_R[1], T[:3, :3], atol=1e-6)


# ------------------------------------------------------------------- VSD


def test_vsd_cases():
    H, W = 20, 30
    d_gt = np.zeros((H, W))
    d_gt[5:15, 5:15] = 400.0
    d_test = d_gt.copy()  # scene depth agrees with gt

    # exact estimate -> 0 at every tau
    errs = vsd_error(d_gt, d_gt, d_test, delta=15.0, taus=(20.0, 50.0))
    assert np.allclose(errs, 0.0)

    # estimate rendered elsewhere -> no overlap: error 1
    d_e = np.zeros((H, W))
    d_e[5:15, 18:28] = 400.0
    errs = vsd_error(d_e, d_gt, d_test, taus=(20.0,))
    assert errs[0] == pytest.approx(1.0)

    # estimate at gt footprint but depth off by 30mm: tau=20 fails, tau=50 ok
    d_e2 = d_gt.copy()
    d_e2[d_gt > 0] += 30.0
    errs = vsd_error(d_e2, d_gt, d_test, delta=50.0, taus=(20.0, 50.0))
    assert errs[0] == pytest.approx(1.0)
    assert errs[1] == pytest.approx(0.0)


def test_vsd_distance_image_semantics():
    """Golden for the bop_toolkit depth->distance conversion
    (misc.depth_im_to_dist_im_fast): off-center pixels compare along the
    viewing ray, so a z-difference inside tau can be a distance-difference
    outside it. Hand-constructed single-pixel case where z-space and
    dist-space verdicts disagree."""
    from gigapose_tpu.eval.errors import depth_im_to_dist_im

    H, W = 4, 8
    # principal point at (0,0), fx=fy=4: pixel (u=7,v=0) has
    # norm = sqrt((7/4)^2 + 0 + 1) = sqrt(65)/4 ≈ 2.0156
    K = np.array([[4.0, 0, 0], [0, 4.0, 0], [0, 0, 1]])
    norm = np.sqrt((7.0 / 4.0) ** 2 + 1.0)

    # conversion golden at two hand-computed pixels
    z = np.zeros((H, W))
    z[0, 7] = 400.0
    z[3, 2] = 100.0
    dist = depth_im_to_dist_im(z, K)
    assert dist[0, 7] == pytest.approx(400.0 * norm)
    assert dist[3, 2] == pytest.approx(
        100.0 * np.sqrt((2.0 / 4.0) ** 2 + (3.0 / 4.0) ** 2 + 1.0)
    )
    assert dist[0, 0] == 0.0  # invalid stays invalid

    # single visible pixel at (0,7): z-diff 20 <= tau 30 (match in z-space)
    # but dist-diff 20*norm ≈ 40.3 > 30 (mismatch along the ray)
    d_gt = np.zeros((H, W))
    d_gt[0, 7] = 400.0
    d_test = d_gt.copy()
    d_est = np.zeros((H, W))
    d_est[0, 7] = 420.0
    # delta=100 keeps the estimate visible in both spaces
    err_z = vsd_error(d_est, d_gt, d_test, delta=100.0, taus=(30.0,))
    err_d = vsd_error(d_est, d_gt, d_test, delta=100.0, taus=(30.0,), K=K)
    assert err_z[0] == pytest.approx(0.0)  # raw z: within tau
    assert err_d[0] == pytest.approx(1.0)  # bop_toolkit distance: outside


# ------------------------------------------------------------ greedy recall


def test_greedy_recall_matching():
    # 2 estimates x 2 gts; the higher-score estimate picks first and takes
    # its lowest-error gt, the second gets the remaining one
    errs = np.array([[0.2, 0.05], [0.06, 0.01]])
    scores = np.array([0.9, 0.5])  # row 0 matches gt 1 (0.05), row 1 gt 0? 0.06
    assert _greedy_recall([errs], [scores], 2, thresh=0.1) == pytest.approx(1.0)
    # tighter threshold: only row-0/gt-1 match survives... row 1's remaining
    # error 0.06 > 0.055
    assert _greedy_recall([errs], [scores], 2, thresh=0.055) == pytest.approx(0.5)
    # empty estimates contribute nothing
    assert _greedy_recall(
        [np.zeros((0, 2))], [np.zeros(0)], 2, thresh=0.1
    ) == pytest.approx(0.0)


# -------------------------------------------------- score_bop end-to-end


def _build_bop_dataset(root, R_g, t_g_mm):
    """Minimal BOP layout: one cube object, one scene, one image, with the
    depth image rendered by the in-repo rasterizer at the gt pose."""
    from gigapose_tpu.render.rasterizer import Rasterizer

    ds = osp.join(root, "datasets", "tudl")
    models = osp.join(ds, "models")
    os.makedirs(models, exist_ok=True)
    mesh = osp.join(models, "obj_000001.ply")
    _write_cube_ply(mesh, size=0.05)  # meters; diameter-based unit inference
    diam = float(np.sqrt(3) * 50.0)  # mm
    Tz = np.eye(4)
    Tz[:3, :3] = _rot([0, 0, 1], 180.0)
    with open(osp.join(models, "models_info.json"), "w") as f:
        json.dump(
            {"1": {"diameter": diam, "symmetries_discrete": [Tz.flatten().tolist()]}},
            f,
        )

    sdir = osp.join(ds, "test", "000001")
    os.makedirs(osp.join(sdir, "depth"), exist_ok=True)
    with open(osp.join(sdir, "scene_gt.json"), "w") as f:
        json.dump(
            {
                "0": [
                    {
                        "cam_R_m2c": R_g.flatten().tolist(),
                        "cam_t_m2c": list(t_g_mm),
                        "obj_id": 1,
                    }
                ]
            },
            f,
        )
    with open(osp.join(sdir, "scene_camera.json"), "w") as f:
        json.dump({"0": {"cam_K": K.flatten().tolist(), "depth_scale": 1.0}}, f)
    with open(osp.join(sdir, "scene_gt_info.json"), "w") as f:
        json.dump({"0": [{"visib_fract": 1.0}]}, f)
    with open(osp.join(ds, "test_targets_bop19.json"), "w") as f:
        json.dump([{"im_id": 0, "inst_count": 1, "obj_id": 1, "scene_id": 1}], f)

    # captured scene depth = rasterized gt depth (mm), uint16
    T = np.eye(4)
    T[:3, :3] = R_g
    T[:3, 3] = np.asarray(t_g_mm) / 1000.0  # mesh units (m)
    _, depth = Rasterizer(mesh).render(K.astype(np.float32), T.astype(np.float32),
                                       640, 480)
    from PIL import Image

    Image.fromarray((depth * 1000.0).astype(np.uint16)).save(
        osp.join(sdir, "depth", "000000.png")
    )
    return ds


def _write_csv(path, R, t_mm, score=1.0):
    bop_io.save_bop_csv(
        path,
        [
            {
                "scene_id": 1,
                "im_id": 0,
                "obj_id": 1,
                "score": score,
                "R": np.asarray(R),
                "t": np.asarray(t_mm),
                "time": -1,
            }
        ],
    )


@pytest.mark.slow
def test_score_bop_end_to_end(tmp_path):
    root = str(tmp_path)
    R_g = _rot([1, 0.2, 0], 30.0)
    t_g = [5.0, -10.0, 400.0]
    _build_bop_dataset(root, R_g, t_g)

    # 1) the gt pose scores a perfect AR on all three errors
    csv = osp.join(root, "gt.csv")
    _write_csv(csv, R_g, t_g)
    out = score_bop(csv, root, "tudl")
    assert out["bop19_average_recall"] == pytest.approx(1.0)
    assert out["bop19_average_recall_vsd"] == pytest.approx(1.0)
    assert out["bop19_average_recall_mssd"] == pytest.approx(1.0)
    assert out["bop19_average_recall_mspd"] == pytest.approx(1.0)

    # 2) a symmetry-equivalent pose (gt composed with the declared 180deg z
    # symmetry) also scores 1.0 — symmetry handling end-to-end
    csv_sym = osp.join(root, "sym.csv")
    _write_csv(csv_sym, R_g @ _rot([0, 0, 1], 180.0), t_g)
    out_sym = score_bop(csv_sym, root, "tudl")
    assert out_sym["bop19_average_recall"] == pytest.approx(1.0)

    # 3) a far-off pose scores ~0
    csv_bad = osp.join(root, "bad.csv")
    _write_csv(csv_bad, _rot([0, 1, 0], 90.0) @ R_g, [150.0, 80.0, 700.0])
    out_bad = score_bop(csv_bad, root, "tudl")
    assert out_bad["bop19_average_recall"] < 0.25

    # 4) mssd/mspd-only path needs no depth/rasterizer
    out_fast = score_bop(csv, root, "tudl", error_types=("mssd", "mspd"))
    assert out_fast["bop19_average_recall"] == pytest.approx(1.0)


@pytest.mark.slow
def test_eval_driver_native_fallback(tmp_path):
    """scripts/eval_bop.score_csv falls back to the native scorer when
    bop_toolkit is absent (it is absent in this image)."""
    from gigapose_tpu.scripts.eval_bop import score_csv

    root = str(tmp_path)
    R_g = np.eye(3)
    t_g = [0.0, 0.0, 350.0]
    _build_bop_dataset(root, R_g, t_g)
    csv = osp.join(root, "gt.csv")
    _write_csv(csv, R_g, t_g)
    out = score_csv(csv, root, "tudl")
    assert out.get("scorer") == "native", out
    assert out["bop19_average_recall"] == pytest.approx(1.0)


def test_modelnet_meter():
    from gigapose_tpu.eval.scorer import ModelNetMeter

    rng = np.random.default_rng(2)
    pts = rng.normal(size=(30, 3)).astype(np.float32) * 40.0  # mm
    meter = ModelNetMeter(pts)
    T = np.eye(4)
    T[:3, 3] = [0, 0, 500.0]
    # exact predictions -> every summary metric is perfect
    for _ in range(4):
        meter.add(T, T, K)
    s = meter.summary()
    assert s["add0.1d"] == 1.0 and s["5deg_5cm"] == 1.0 and s["proj2d_5px"] == 1.0
    # a wildly wrong prediction dilutes the rates to 4/5
    T_bad = T.copy()
    T_bad[:3, :3] = _rot([0, 1, 0], 90.0)
    T_bad[:3, 3] += [200.0, 0, 0]
    meter.add(T_bad, T, K)
    s = meter.summary()
    assert s["add0.1d"] == pytest.approx(0.8)
    assert s["5deg_5cm"] == pytest.approx(0.8)
