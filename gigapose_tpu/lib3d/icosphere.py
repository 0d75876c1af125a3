"""Icosphere template viewpoints, regenerated numerically.

The reference ships pre-computed pose assets (src/lib3d/predefined_poses/
{obj,cam}_poses_level{0,1,2}.npy) produced by a Blender script
(src/lib3d/create_template_poses.py): vertices of a subdivided icosahedron,
sorted by (elevation, azimuth) with az = atan2(x, y), turned into look-at
camera poses at radius 1000, and inverted into object poses.

We regenerate the same poses from first principles — Blender's canonical
icosahedron table (public constants from its mesh-primitive source) plus
recursive edge-midpoint subdivision simulated in float32 so the reference's
(elevation, azimuth) sort order is reproduced — no asset is copied; tests
compare our output against the reference .npy files.

level 0 -> 42 views, level 1 -> 162 views (the GigaPose default), level 2 -> 642.

Ordering caveat: within constant-elevation rings the reference's order is
decided by sub-1e-6-radian float noise of Blender's C kernels. We reproduce
150/162 level-1 rows bit-compatibly; the remaining 12 are adjacent within-ring
swaps of viewpoints < 0.0001 deg apart. This never matters in practice because
template *poses are always loaded from the template set's own pose file*
(mirroring the reference, whose render scripts save object_poses/{obj}.npy
next to the rendered images — and whose downloadable pre-rendered template
sets ship those pose files); this generated table is used for our own
rendering and for train-time nearest-view search, both of which only require
internal consistency.

The residual 12 swaps were exhaustively chased (r3): 50+ arithmetic variants
of the simulation — midpoint as (a+b)*0.5 / a+(b-a)*0.5 / per-component fma,
normalization by f64 divide / f32 divide / f32 reciprocal-multiply at each of
the three normalization sites, base-table scaling as f64/200 vs f32*(1/200f)
vs f32/200f, f32 vs f64 atan2 sort keys, slerp-style spherical midpoints, and
a full-f64 (exact) pipeline — ALL plateau at exactly 150/162 (best level-2:
589/642). The swapped groups are symmetry orbits whose exact elevations
differ by ~1e-6 rad; the full-f64 run shows the *exact-arithmetic* order
agrees with OURS, i.e. the reference rows are the ones perturbed by Blender
noise (likely SIMD/fma contraction in that particular Blender build), which
no clean re-derivation can legally reproduce without copying the asset.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax.numpy as jnp

RADIUS_MM = 1000.0

# Blender's canonical icosahedron (mesh-primitive vertex table, radius 200):
# poles on +-z, two rings at z = +-89.443, azimuths interleaved by 36 deg.
_BLENDER_ICOVERT = np.array(
    [
        [0.0, 0.0, -200.0],
        [144.72, -105.144, -89.443],
        [-55.277, -170.128, -89.443],
        [-178.885, 0.0, -89.443],
        [-55.277, 170.128, -89.443],
        [144.72, 105.144, -89.443],
        [55.277, -170.128, 89.443],
        [-144.72, -105.144, 89.443],
        [-144.72, 105.144, 89.443],
        [55.277, 170.128, 89.443],
        [178.885, 0.0, 89.443],
        [0.0, 0.0, 200.0],
    ],
    dtype=np.float64,
)
_BLENDER_ICOFACE = [
    (0, 1, 2), (1, 0, 5), (0, 2, 3), (0, 3, 4), (0, 4, 5),
    (1, 5, 10), (2, 1, 6), (3, 2, 7), (4, 3, 8), (5, 4, 9),
    (1, 10, 6), (2, 6, 7), (3, 7, 8), (4, 8, 9), (5, 9, 10),
    (6, 10, 11), (7, 6, 11), (8, 7, 11), (9, 8, 11), (10, 9, 11),
]

_f32 = np.float32


def _subdivide_f32(verts, faces, spherize: bool):
    """One round of edge-midpoint subdivision in float32 (Blender-compatible).

    spherize=True renormalizes new midpoints to the unit sphere immediately
    (what Blender's icosphere primitive does for its built-in subdivision);
    spherize=False leaves raw midpoints (the edit-mode subdivide the reference
    script uses, which normalizes every vertex afterwards in Python floats).
    """
    verts = [v.copy() for v in verts]
    cache: dict[tuple[int, int], int] = {}

    def midpoint(i: int, j: int) -> int:
        key = (min(i, j), max(i, j))
        if key not in cache:
            m = ((verts[key[0]] + verts[key[1]]) * _f32(0.5)).astype(_f32)
            if spherize:
                m = (m / _f32(np.linalg.norm(m.astype(np.float64)))).astype(_f32)
            cache[key] = len(verts)
            verts.append(m)
        return cache[key]

    new_faces = []
    for a, b, c in faces:
        ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
        new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
    return np.stack(verts), new_faces


def _script_normalize(v: np.ndarray) -> np.ndarray:
    """Per-vertex normalization in Python float64 stored back to float32 — the
    arithmetic the reference's generator performs after each subdivide."""
    out = v.copy()
    for i in range(len(v)):
        l = math.sqrt(float(v[i, 0]) ** 2 + float(v[i, 1]) ** 2 + float(v[i, 2]) ** 2)
        for c in range(3):
            out[i, c] = _f32(float(v[i, c]) / l)
    return out


def _look_at(cam_location: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Camera-to-world pose with +z forward (OpenCV-style look-at; matches
    reference src/lib3d/create_template_poses.py:73-103 incl. its pole fallback)."""
    forward = target - cam_location
    forward = forward / np.linalg.norm(forward)
    tmp = np.array([0.0, 0.0, -1.0])
    if min(
        np.linalg.norm(cam_location - tmp), np.linalg.norm(cam_location + tmp)
    ) < 1e-3:
        tmp = np.array([0.0, -1.0, 0.0])
    right = np.cross(tmp, forward)
    right = right / np.linalg.norm(right)
    up = np.cross(forward, right)
    up = up / np.linalg.norm(up)
    pose = np.eye(4)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = right, up, forward, cam_location
    return pose


@functools.lru_cache(maxsize=None)
def icosphere_views(level: int = 1) -> np.ndarray:
    """Unit-sphere viewpoints for template level, sorted by (elevation, azimuth)
    with azimuth = atan2(x, y) — the reference's ordering, which template image
    indices {000000..} depend on. level 0/1/2 -> 42/162/642 points."""
    verts = (_BLENDER_ICOVERT / 200.0).astype(_f32)
    faces = list(_BLENDER_ICOFACE)
    # Blender's default icosphere primitive = one spherized subdivision round
    verts, faces = _subdivide_f32(verts, faces, spherize=True)
    for _ in range(level):
        verts, faces = _subdivide_f32(verts, faces, spherize=False)
        verts = _script_normalize(verts)
    el = [math.atan2(float(z), math.hypot(float(x), float(y))) for x, y, z in verts]
    az = [math.atan2(float(x), float(y)) for x, y, z in verts]
    order = sorted(range(len(verts)), key=lambda i: (el[i], az[i]))
    return verts[order].astype(np.float64)


@functools.lru_cache(maxsize=None)
def template_camera_poses(level: int = 1, radius: float = RADIUS_MM) -> np.ndarray:
    """(V, 4, 4) camera-to-world poses, +z looking at the origin, at `radius`."""
    views = icosphere_views(level)
    poses = np.stack([_look_at(v, np.zeros(3)) for v in views])
    poses[:, :3, 3] *= radius
    return poses


@functools.lru_cache(maxsize=None)
def template_object_poses(level: int = 1, radius: float = RADIUS_MM) -> np.ndarray:
    """(V, 4, 4) object poses in camera frame = inverse of the camera poses
    (what the reference stores in obj_poses_level{L}.npy and uses everywhere)."""
    cam = template_camera_poses(level, radius)
    obj = np.zeros_like(cam)
    R_t = np.transpose(cam[:, :3, :3], (0, 2, 1))
    obj[:, :3, :3] = R_t
    obj[:, :3, 3] = -np.einsum("vij,vj->vi", R_t, cam[:, :3, 3])
    obj[:, 3, 3] = 1.0
    return obj


def nearest_template_index(
    obj_query_pose: jnp.ndarray, obj_template_poses: jnp.ndarray
) -> jnp.ndarray:
    """Index of the template whose out-of-plane viewpoint is closest to the query.

    The reference (NearestTemplateFinder.search_nearest_template,
    src/lib3d/template_transform.py:137-154) compares the OpenGL-converted
    z-rows of the object poses; the OpenCV->OpenGL flip negates rows 1 and 2 of
    both operands identically, so comparing the raw z-rows gives the same
    argmin. Shapes: (..., 4, 4) query vs (V, 4, 4) templates -> (...,) int.
    """
    q = obj_query_pose[..., 2, :3]  # z row of R (translation excluded)
    t = obj_template_poses[..., 2, :3]  # (V, 3)
    d2 = jnp.sum((q[..., None, :] - t) ** 2, axis=-1)
    return jnp.argmin(d2, axis=-1)
