"""Native BOP19 pose scoring: csv + dataset -> average recall.

The reference scores its csv artifacts by shelling out to bop_toolkit
(src/megapose/evaluation/bop.py:139-176 `_run_bop_evaluation`), so AR is
unobtainable wherever bop_toolkit (and its vispy GL renderer) isn't
installed — including this image. This module recomputes the BOP19 protocol
natively: VSD via the in-repo C++ rasterizer (render/rasterizer.py) instead
of vispy, MSSD/MSPD as jitted fixed-shape kernels (eval/errors.py), and the
greedy score-ordered matching + threshold-grid recall of
bop_toolkit/scripts/eval_bop19_pose. scripts/eval_bop.py falls back to this
when bop_toolkit is absent.

bop_toolkit-exactness (r4): the two previously-documented deviations are
closed —
- continuous-symmetry discretization now replicates
  misc.get_symmetry_transformations exactly (fixed ceil(pi/0.01) step
  count, cont∘disc composition, no pure identity when a continuous
  symmetry exists — see symmetry_set below; goldens in
  tests/test_eval.py::test_symmetry_set_bop_toolkit_exact);
- VSD converts all three depth images to DISTANCE images
  (misc.depth_im_to_dist_im_fast) before the visibility/cost comparisons
  (errors.depth_im_to_dist_im; golden in
  tests/test_eval.py::test_vsd_distance_image_semantics). The visibility
  masks themselves were already the bop19 formulas (bop_toolkit's
  visibility.py applies no morphology in visib_mode='bop19').
"""

from __future__ import annotations

import json
import os.path as osp
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from gigapose_tpu.dataloader import bop_io
from gigapose_tpu.eval import errors as E
from gigapose_tpu.utils.logging import get_logger

logger = get_logger(__name__)

# BOP19 threshold grids (eval_bop19_pose defaults)
VSD_DELTA = 15.0  # mm; taus are 0.05..0.5 of the object diameter
REC_THRESH_VSD = np.arange(0.05, 0.51, 0.05)  # error in [0,1]
REC_THRESH_MSSD = np.arange(0.05, 0.51, 0.05)  # fractions of diameter
REC_THRESH_MSPD = np.arange(5, 51, 5)  # px at 640-wide images
VISIB_GT_MIN = 0.1


def load_models_info(models_dir: str) -> Dict[int, dict]:
    """models_info.json when present (BOP ships it); else diameters computed
    from the meshes and no symmetries."""
    path = osp.join(models_dir, "models_info.json")
    if osp.exists(path):
        with open(path) as f:
            raw = json.load(f)
        return {int(k): v for k, v in raw.items()}
    info = {}
    import glob

    for mesh in sorted(glob.glob(osp.join(models_dir, "obj_*.ply")) +
                       glob.glob(osp.join(models_dir, "obj_*.obj"))):
        obj_id = int(osp.basename(mesh).split("_")[1].split(".")[0])
        verts, scale = _load_vertices_mm(mesh)
        info[obj_id] = {"diameter": _diameter(verts)}
    return info


def _load_vertices_mm(mesh_path: str) -> Tuple[np.ndarray, float]:
    """Vertices in mm + the mesh-unit->mm scale (diameter-based unit
    inference, the convention used across the repo; ref: call_panda3d.py
    mesh-unit inference)."""
    from gigapose_tpu.refiner.refiner import _load_vertices

    verts = _load_vertices(mesh_path)
    d = _diameter(verts)
    scale = 1000.0 if d < 5.0 else 1.0
    return verts * scale, scale


def _diameter(verts: np.ndarray, cap: int = 2000) -> float:
    v = verts
    if len(v) > cap:
        v = v[np.linspace(0, len(v) - 1, cap).astype(int)]
    d2 = ((v[:, None, :] - v[None, :, :]) ** 2).sum(-1)
    return float(np.sqrt(d2.max()))


def symmetry_set(
    info: dict, verts_mm: Optional[np.ndarray] = None,
    max_disc_step: float = 0.01,
) -> Tuple[np.ndarray, np.ndarray]:
    """(S,3,3),(S,3) symmetry transforms — bop_toolkit
    misc.get_symmetry_transformations semantics, replicated EXACTLY:

    - continuous symmetries are discretized into a FIXED
      ceil(pi / max_disc_step) steps (the toolkit's bound assumes the
      farthest vertex sits at diameter/2 from the axis: per-step arc
      (2pi/n)(d/2) <= max_disc_step * d  =>  n >= pi/max_disc_step),
      NOT a per-mesh vertex-radius count — 315 steps at the BOP19 default
      max_sym_disc_step = 0.01;
    - the continuous set excludes the identity (i runs 1..n-1), and when a
      continuous symmetry exists the combined set contains ONLY
      cont∘disc compositions — the pure identity is absent, exactly as in
      the toolkit (a perfect estimate then scores the <=1%-of-diameter
      residual of the nearest discretized rotation, far under the 5%
      lowest BOP19 threshold);
    - composition order is cont∘disc: R = R_cont @ R_disc,
      t = R_cont @ t_disc + t_cont.

    verts_mm is unused (kept for call-site compatibility; the toolkit's
    count is mesh-independent)."""
    del verts_mm
    disc_R = [np.eye(3)]
    disc_t = [np.zeros(3)]
    for m in info.get("symmetries_discrete", []):
        T = np.asarray(m, np.float64).reshape(4, 4)
        disc_R.append(T[:3, :3])
        disc_t.append(T[:3, 3])
    cont_R: List[np.ndarray] = []
    cont_t: List[np.ndarray] = []
    for sym in info.get("symmetries_continuous", []):
        axis = np.asarray(sym["axis"], np.float64)
        axis = axis / np.linalg.norm(axis)
        offset = np.asarray(sym.get("offset", [0, 0, 0]), np.float64)
        n = int(np.ceil(np.pi / max_disc_step))
        for k in range(1, n):
            R = _axis_angle(axis, 2.0 * np.pi * k / n)
            cont_R.append(R)
            cont_t.append(offset - R @ offset)
    R, t = [], []
    for dR, dt in zip(disc_R, disc_t):
        if cont_R:
            for cR, ct in zip(cont_R, cont_t):
                R.append(cR @ dR)
                t.append(cR @ dt + ct)
        else:
            R.append(dR)
            t.append(dt)
    return np.stack(R).astype(np.float32), np.stack(t).astype(np.float32)


def _axis_angle(axis: np.ndarray, angle: float) -> np.ndarray:
    x, y, z = axis
    K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def _greedy_recall(
    err_mats: List[np.ndarray], scores: List[np.ndarray], n_gt_total: int,
    thresh: float,
) -> float:
    """bop_toolkit matching: per image-group, estimates in score order each
    claim the lowest-error unmatched gt with error < thresh."""
    matched = 0
    for errs, sc in zip(err_mats, scores):
        if errs.size == 0:
            continue
        taken = np.zeros(errs.shape[1], bool)
        for i in np.argsort(-sc):
            ok = np.where(~taken & (errs[i] < thresh))[0]
            if ok.size:
                j = ok[np.argmin(errs[i][ok])]
                taken[j] = True
                matched += 1
    return matched / max(n_gt_total, 1)


class _SceneGT:
    """Lazy per-scene gt / camera / depth access in the BOP dir layout."""

    def __init__(self, split_dir: str):
        self.split_dir = split_dir
        self._cache: Dict[int, tuple] = {}

    def get(self, scene_id: int):
        if scene_id not in self._cache:
            sdir = osp.join(self.split_dir, f"{scene_id:06d}")
            with open(osp.join(sdir, "scene_gt.json")) as f:
                gt = json.load(f)
            with open(osp.join(sdir, "scene_camera.json")) as f:
                cam = json.load(f)
            info_path = osp.join(sdir, "scene_gt_info.json")
            info = {}
            if osp.exists(info_path):
                with open(info_path) as f:
                    info = json.load(f)
            self._cache[scene_id] = (sdir, gt, cam, info)
        return self._cache[scene_id]

    def depth(self, scene_id: int, im_id: int) -> Optional[np.ndarray]:
        sdir, _, cam, _ = self.get(scene_id)
        path = osp.join(sdir, "depth", f"{im_id:06d}.png")
        if not osp.exists(path):
            return None
        from PIL import Image

        d = np.asarray(Image.open(path), np.float64)
        return d * float(cam[str(im_id)].get("depth_scale", 1.0))


def score_bop(
    csv_path: str,
    root_dir: str,
    dataset_name: str,
    split: str = "test",
    error_types: Sequence[str] = ("vsd", "mssd", "mspd"),
    max_points: int = 2000,
) -> dict:
    """Score a BOP19 csv against the dataset's ground truth. Returns
    {bop19_average_recall, bop19_average_recall_{vsd,mssd,mspd}, ...}."""
    from gigapose_tpu.render.rasterizer import Rasterizer

    ds_dir = osp.join(root_dir, "datasets", dataset_name)
    models_dir = osp.join(ds_dir, "models")
    split_dir = osp.join(ds_dir, split)
    results = bop_io.load_bop_csv(csv_path)
    with open(osp.join(ds_dir, "test_targets_bop19.json")) as f:
        targets = json.load(f)

    models_info = load_models_info(models_dir)
    scene_gt = _SceneGT(split_dir)

    # per-object geometry (vertices in mm + symmetry set + rasterizer)
    geo: Dict[int, dict] = {}

    def get_geo(obj_id: int) -> dict:
        if obj_id not in geo:
            mesh = osp.join(models_dir, f"obj_{obj_id:06d}.ply")
            if not osp.exists(mesh):
                mesh = osp.join(models_dir, f"obj_{obj_id:06d}.obj")
            verts, scale = _load_vertices_mm(mesh)
            if len(verts) > max_points:
                verts = verts[np.linspace(0, len(verts) - 1, max_points).astype(int)]
            info = models_info.get(obj_id, {"diameter": _diameter(verts)})
            sym_R, sym_t = symmetry_set(info, verts)
            geo[obj_id] = {
                "verts": verts.astype(np.float32),
                "diameter": float(info["diameter"]),
                "sym": (sym_R, sym_t),
                "raster": Rasterizer(mesh) if "vsd" in error_types else None,
                "unit_to_mm": scale,
            }
        return geo[obj_id]

    # group estimates by (scene, im, obj); keep top inst_count by score
    est_by_group: Dict[tuple, List[dict]] = {}
    for r in results:
        est_by_group.setdefault((r["scene_id"], r["im_id"], r["obj_id"]), []).append(r)

    # accumulate per-error-type matrices over all target groups
    mats: Dict[str, List] = {e: [] for e in error_types}
    scores: List[np.ndarray] = []
    diam_per_group: List[float] = []
    imw_per_group: List[float] = []
    n_gt_total = 0
    n_taus = 10

    for tgt in targets:
        sid, iid, oid = tgt["scene_id"], tgt["im_id"], tgt["obj_id"]
        inst = int(tgt.get("inst_count", 1))
        sdir, gt_all, cam_all, info_all = scene_gt.get(sid)
        cam = cam_all[str(iid)]
        K = np.asarray(cam["cam_K"], np.float64).reshape(3, 3)
        gts = [
            (k, g) for k, g in enumerate(gt_all.get(str(iid), []))
            if g["obj_id"] == oid
        ]
        # bop19 validity: visib_fract >= 0.1 when gt_info exists
        im_info = info_all.get(str(iid), [])
        gts = [
            (k, g) for k, g in gts
            if not im_info or im_info[k].get("visib_fract", 1.0) >= VISIB_GT_MIN
        ]
        if not gts:
            continue
        n_gt_total += min(inst, len(gts))
        g = get_geo(oid)
        ests = sorted(
            est_by_group.get((sid, iid, oid), []),
            key=lambda r: -r["score"],
        )[:inst]
        sc = np.asarray([r["score"] for r in ests])
        scores.append(sc)
        diam_per_group.append(g["diameter"])

        depth_test = scene_gt.depth(sid, iid) if "vsd" in error_types else None
        if depth_test is not None:
            H, W = depth_test.shape
            # bop_toolkit compares DISTANCE images; convert the static scene
            # depth ONCE per target group (est/gt renders are converted at
            # render time below), not per (est, gt) pair
            dist_test = E.depth_im_to_dist_im(depth_test, K)
        else:
            # image size from any rgb file is not needed for mssd; mspd
            # normalization uses 640 by protocol, the actual width only
            # rescales thresholds — read it lazily from the depth/rgb
            W = 640
        imw_per_group.append(float(W))

        m = {e: np.zeros((len(ests), len(gts))) for e in error_types
             if e != "vsd"}
        if "vsd" in error_types:
            m["vsd"] = np.zeros((len(ests), len(gts), n_taus))
        gt_depth_cache = {}
        for j, (k_gt, gt) in enumerate(gts):
            R_g = np.asarray(gt["cam_R_m2c"], np.float64).reshape(3, 3)
            t_g = np.asarray(gt["cam_t_m2c"], np.float64).reshape(3)
            for i, r in enumerate(ests):
                R_e, t_e = r["R"], r["t"].reshape(3)
                if "mssd" in error_types:
                    m["mssd"][i, j] = E.mssd_error(
                        R_e, t_e, R_g, t_g, g["verts"], *g["sym"])
                if "mspd" in error_types:
                    m["mspd"][i, j] = E.mspd_error(
                        R_e, t_e, R_g, t_g, g["verts"], K, *g["sym"])
                if "vsd" in error_types and depth_test is not None:
                    if j not in gt_depth_cache:
                        gt_depth_cache[j] = E.depth_im_to_dist_im(
                            _render_depth_mm(g, K, R_g, t_g, W, H), K)
                    d_gt = gt_depth_cache[j]  # distance image (cached)
                    d_est = E.depth_im_to_dist_im(
                        _render_depth_mm(g, K, R_e, t_e, W, H), K)
                    taus = np.arange(0.05, 0.51, 0.05) * g["diameter"]
                    # all three inputs are pre-converted -> K=None
                    m["vsd"][i, j] = E.vsd_error(
                        d_est, d_gt, dist_test, VSD_DELTA, taus)
                elif "vsd" in error_types:
                    m["vsd"][i, j] = 1.0  # no depth -> VSD undefined/failed
        for e in error_types:
            mats[e].append(m[e])

    out = {}
    recalls_all = []
    if "vsd" in error_types:
        recs = []
        for ti in range(n_taus):
            tau_mats = [m[:, :, ti] for m in mats["vsd"]]
            for th in REC_THRESH_VSD:
                recs.append(_greedy_recall(tau_mats, scores, n_gt_total, th))
        out["bop19_average_recall_vsd"] = float(np.mean(recs)) if recs else 0.0
        recalls_all.append(out["bop19_average_recall_vsd"])
    if "mssd" in error_types:
        recs = []
        for th in REC_THRESH_MSSD:
            dmats = [m / d for m, d in zip(mats["mssd"], diam_per_group)]
            recs.append(_greedy_recall(dmats, scores, n_gt_total, th))
        out["bop19_average_recall_mssd"] = float(np.mean(recs)) if recs else 0.0
        recalls_all.append(out["bop19_average_recall_mssd"])
    if "mspd" in error_types:
        recs = []
        for th in REC_THRESH_MSPD:
            # thresholds scale with im_width/640 (BOP19)
            nmats = [m * (640.0 / w) for m, w in zip(mats["mspd"], imw_per_group)]
            recs.append(_greedy_recall(nmats, scores, n_gt_total, th))
        out["bop19_average_recall_mspd"] = float(np.mean(recs)) if recs else 0.0
        recalls_all.append(out["bop19_average_recall_mspd"])
    out["bop19_average_recall"] = float(np.mean(recalls_all)) if recalls_all else 0.0
    out["n_targets"] = n_gt_total
    out["scorer"] = "native"
    return out


def _render_depth_mm(g: dict, K, R, t, W, H) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = np.asarray(t, np.float64) / g["unit_to_mm"]  # mm -> mesh units
    _, depth = g["raster"].render(
        np.asarray(K, np.float32), T.astype(np.float32), W, H)
    return depth * g["unit_to_mm"]


class ModelNetMeter:
    """The reference's ModelNetErrorMeter summary (modelnet_meters.py:92-106):
    add0.1d / 5deg_5cm / proj2d_5px over accumulated (pred, gt) pose pairs.
    Units here: mm poses + mm points (converted to the meter thresholds)."""

    def __init__(self, points_mm: np.ndarray):
        self.pts = np.asarray(points_mm, np.float32)
        extent = self.pts.max(0) - self.pts.min(0)
        self.diameter = float(np.linalg.norm(extent))
        self.rows: List[dict] = []

    def add(self, T_pred_mm: np.ndarray, T_gt_mm: np.ndarray, K: np.ndarray):
        Rp, tp = T_pred_mm[:3, :3], T_pred_mm[:3, 3]
        Rg, tg = T_gt_mm[:3, :3], T_gt_mm[:3, 3]
        self.rows.append({
            "add": E.add_error(Rp, tp, Rg, tg, self.pts),
            "trans_dist_m": float(np.linalg.norm(tp - tg)) / 1000.0,
            "angular_deg": E.angular_error_deg(Rp, Rg),
            "proj_px": self._proj_err(Rp, tp, Rg, tg, K),
        })

    def _proj_err(self, Rp, tp, Rg, tg, K) -> float:
        def proj(R, t):
            p = self.pts @ R.T + t
            uv = p @ np.asarray(K).T
            return uv[:, :2] / uv[:, 2:3]

        return float(np.linalg.norm(proj(Rp, tp) - proj(Rg, tg), axis=1).mean())

    def summary(self) -> dict:
        add = np.array([r["add"] for r in self.rows])
        td = np.array([r["trans_dist_m"] for r in self.rows])
        ang = np.array([r["angular_deg"] for r in self.rows])
        proj = np.array([r["proj_px"] for r in self.rows])
        return {
            "add0.1d": float((add < 0.1 * self.diameter).mean()),
            "5deg_5cm": float(((td < 0.05) & (ang < 5)).mean()),
            "proj2d_5px": float((proj < 5).mean()),
            "auc_add_m": E.auc_posecnn(add / 1000.0),
        }


def convert_results_to_coco(
    csv_path: str, out_json: str, root_dir: str, dataset_name: str
) -> int:
    """Pose csv -> COCO detection json (the reference's
    convert_results_to_coco, evaluation/bop.py:63-97, reuses stored detection
    boxes; here the box is derived by projecting the model's vertices under
    the estimated pose — a pure function of the csv artifact)."""
    results = bop_io.load_bop_csv(csv_path)
    models_dir = osp.join(root_dir, "datasets", dataset_name, "models")
    verts_cache: Dict[int, np.ndarray] = {}
    anns = []
    for r in results:
        oid = r["obj_id"]
        if oid not in verts_cache:
            mesh = osp.join(models_dir, f"obj_{oid:06d}.ply")
            verts_cache[oid], _ = _load_vertices_mm(mesh)
        p = verts_cache[oid] @ r["R"].T + r["t"].reshape(3)
        # project with the csv's implicit camera? csv carries no K; boxes in
        # normalized form are useless -> require the scene camera
        sdir = osp.join(root_dir, "datasets", dataset_name, "test",
                        f"{r['scene_id']:06d}")
        with open(osp.join(sdir, "scene_camera.json")) as f:
            K = np.asarray(
                json.load(f)[str(r["im_id"])]["cam_K"], np.float64
            ).reshape(3, 3)
        uv = p @ K.T
        uv = uv[:, :2] / np.maximum(uv[:, 2:3], 1e-9)
        x0, y0 = uv.min(0)
        x1, y1 = uv.max(0)
        anns.append({
            "scene_id": r["scene_id"],
            "image_id": r["im_id"],
            "category_id": oid,
            "score": r["score"],
            "bbox": [float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
        })
    with open(out_json, "w") as f:
        json.dump(anns, f)
    return len(anns)


def main(argv=None):
    import sys

    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    out = score_bop(
        args["csv"],
        args.get("root", "."),
        args["dataset"],
        split=args.get("split", "test"),
        error_types=tuple(args.get("errors", "vsd,mssd,mspd").split(",")),
    )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
