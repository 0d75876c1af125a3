"""Pose-error functions for BOP / ModelNet evaluation.

TPU-native rebuild of the error math behind the reference's eval stacks:

- the BOP19 pose errors (MSSD / MSPD / VSD) that bop_toolkit computes when the
  reference shells out to it (reference: src/megapose/evaluation/bop.py:139-176
  runs `bop_toolkit_lib/scripts/eval_bop19_pose`); rebuilding them here makes
  AR computable in-process, with the symmetry max-min as one fixed-shape jitted
  einsum instead of a per-vertex Python loop;
- the ModelNet meter errors (ADD / ADD-S / PoseCNN AUC / 5deg-5cm / proj2d,
  reference: src/megapose/evaluation/meters/modelnet_meters.py:46-106,
  meters/utils.py:160-180).

Conventions: rotations are (3,3) row-major, translations mm, points mm (N,3).
Symmetries are given as a stacked set (S,3,3)+(S,3) from scorer.symmetry_set
(bop_toolkit semantics: the pure identity is present unless the object has a
continuous symmetry, in which case only discretized compositions appear).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "mssd_error",
    "mspd_error",
    "add_error",
    "adds_error",
    "vsd_error",
    "auc_posecnn",
    "angular_error_deg",
]


def _transform(R, t, pts):
    """(…,3,3),(…,3),(N,3) -> (…,N,3)."""
    return jnp.einsum("...ij,nj->...ni", R, pts) + t[..., None, :]


@jax.jit
def _mssd(R_e, t_e, R_g, t_g, sym_R, sym_t, pts):
    # gt pose composed with each symmetry: x -> R_g (S_R x + S_t) + t_g
    gt = _transform(R_g @ sym_R, (R_g @ sym_t[..., None])[..., 0] + t_g, pts)
    est = _transform(R_e, t_e, pts)  # (N,3)
    d = jnp.linalg.norm(est[None] - gt, axis=-1)  # (S,N)
    return jnp.min(jnp.max(d, axis=1))  # max over verts, min over syms


def _project(K, pts):
    uvw = jnp.einsum("ij,nj->ni", K, pts)
    return uvw[:, :2] / jnp.maximum(uvw[:, 2:3], 1e-9)


@jax.jit
def _mspd(R_e, t_e, R_g, t_g, sym_R, sym_t, pts, K):
    gt = _transform(R_g @ sym_R, (R_g @ sym_t[..., None])[..., 0] + t_g, pts)
    est = _project(K, _transform(R_e, t_e, pts))
    gt2 = jax.vmap(partial(_project, K))(gt)  # (S,N,2)
    d = jnp.linalg.norm(est[None] - gt2, axis=-1)
    return jnp.min(jnp.max(d, axis=1))


@jax.jit
def _add(R_e, t_e, R_g, t_g, pts):
    return jnp.mean(
        jnp.linalg.norm(_transform(R_e, t_e, pts) - _transform(R_g, t_g, pts), axis=-1)
    )


@jax.jit
def _adds(R_e, t_e, R_g, t_g, pts):
    est = _transform(R_e, t_e, pts)
    gt = _transform(R_g, t_g, pts)
    # chamfer from gt to the closest est point (bop_toolkit 'adi' direction)
    d = jnp.linalg.norm(gt[:, None, :] - est[None, :, :], axis=-1)  # (N,N)
    return jnp.mean(jnp.min(d, axis=1))


def _np(fn, *args):
    return float(np.asarray(fn(*[jnp.asarray(a, jnp.float32) for a in args])))


def mssd_error(R_e, t_e, R_g, t_g, pts, sym_R=None, sym_t=None) -> float:
    """Maximum Symmetry-aware Surface Distance (BOP19), mm."""
    sym_R, sym_t = _default_syms(sym_R, sym_t)
    return _np(_mssd, R_e, t_e, R_g, t_g, sym_R, sym_t, pts)


def mspd_error(R_e, t_e, R_g, t_g, pts, K, sym_R=None, sym_t=None) -> float:
    """Maximum Symmetry-aware Projection Distance (BOP19), px (un-normalized:
    the caller scales thresholds by im_width/640 per the BOP19 protocol)."""
    sym_R, sym_t = _default_syms(sym_R, sym_t)
    return _np(_mspd, R_e, t_e, R_g, t_g, sym_R, sym_t, pts, K)


def add_error(R_e, t_e, R_g, t_g, pts) -> float:
    return _np(_add, R_e, t_e, R_g, t_g, pts)


def adds_error(R_e, t_e, R_g, t_g, pts) -> float:
    return _np(_adds, R_e, t_e, R_g, t_g, pts)


def angular_error_deg(R_e, R_g) -> float:
    cos = (np.trace(np.asarray(R_e).T @ np.asarray(R_g)) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))


def _default_syms(sym_R, sym_t):
    if sym_R is None:
        sym_R = np.eye(3)[None]
        sym_t = np.zeros((1, 3))
    return np.asarray(sym_R, np.float32), np.asarray(sym_t, np.float32)


def depth_im_to_dist_im(depth_im: np.ndarray, K: np.ndarray) -> np.ndarray:
    """Depth (z along the optical axis) -> distance from the camera center,
    bop_toolkit misc.depth_im_to_dist_im_fast: dist = z * ||((u-cx)/fx,
    (v-cy)/fy, 1)||. Zero (invalid/background) stays zero."""
    d = np.asarray(depth_im, np.float64)
    K = np.asarray(K, np.float64)
    h, w = d.shape
    xs = (np.arange(w, dtype=np.float64) - K[0, 2]) / K[0, 0]
    ys = (np.arange(h, dtype=np.float64) - K[1, 2]) / K[1, 1]
    norm = np.sqrt(xs[None, :] ** 2 + ys[:, None] ** 2 + 1.0)
    return d * norm


def vsd_error(
    depth_est: np.ndarray,
    depth_gt: np.ndarray,
    depth_test: np.ndarray,
    delta: float = 15.0,
    taus=(20.0,),
    K: np.ndarray = None,
) -> np.ndarray:
    """Visible Surface Discrepancy (BOP19 'step' cost), host-side numpy.

    depth_est / depth_gt: rendered object depth (mm, 0 = background) at the
    estimated / ground-truth pose; depth_test: the captured scene depth (mm,
    0 = invalid). Visibility of a rendered surface = rendered pixels not
    occluded by the measured scene (rendered depth <= scene depth + delta, or
    scene depth invalid) — the bop_toolkit visibility model
    (bop_toolkit_lib/visibility.py, visib_mode='bop19'). With K given, all
    three depth images are first converted to DISTANCE images
    (depth_im_to_dist_im), exactly as bop_toolkit's vsd() does before any
    comparison — off-center pixels then compare along the viewing ray, which
    shifts delta/tau decisions near the image borders. Returns one error per
    tau in [0, 1]; 1 where both visibility masks are empty."""
    if K is not None:
        depth_est = depth_im_to_dist_im(depth_est, K)
        depth_gt = depth_im_to_dist_im(depth_gt, K)
        depth_test = depth_im_to_dist_im(depth_test, K)
    d_e = np.asarray(depth_est, np.float64)
    d_g = np.asarray(depth_gt, np.float64)
    d_t = np.asarray(depth_test, np.float64)

    def visib(d):
        rendered = d > 0
        no_meas = d_t <= 0
        return rendered & (no_meas | (d <= d_t + delta))

    # GT visibility per bop_toolkit: est visibility is additionally granted on
    # pixels where the GT object is visible (an estimate may legitimately
    # claim pixels the gt object occupies even if another object occludes the
    # scene there).
    v_g = visib(d_g)
    v_e = visib(d_e) | ((d_e > 0) & v_g)
    union = v_e | v_g
    n_union = int(union.sum())
    errs = []
    for tau in taus:
        if n_union == 0:
            errs.append(1.0)
            continue
        both = v_e & v_g
        diff_ok = both & (np.abs(d_e - d_g) <= tau)
        errs.append(1.0 - diff_ok.sum() / n_union)
    return np.asarray(errs)


def auc_posecnn(errors: np.ndarray, max_err: float = 0.1) -> float:
    """PoseCNN-style ADD AUC up to max_err (meters in the original), matching
    the reference's compute_auc_posecnn (meters/utils.py:160-180): the area
    under the monotonized accuracy-vs-error step curve, normalized by
    max_err; errors above max_err count as never-correct."""
    errors = np.sort(np.asarray(errors, np.float64))
    n = errors.shape[0]
    if n == 0:
        return float("nan")
    acc = np.arange(1, n + 1) / n
    keep = errors <= max_err
    if not keep.any():  # the reference returns nan when nothing is below cap
        return float("nan")
    rec = np.concatenate(([0.0], errors[keep], [max_err]))
    prec = np.concatenate(([0.0], acc[keep], [acc[keep][-1]]))
    prec = np.maximum.accumulate(prec)
    ids = np.where(rec[1:] != rec[:-1])[0] + 1
    return float(((rec[ids] - rec[ids - 1]) * prec[ids]).sum() / max_err)
