"""On-device mesh rendering for the refinement loop.

The reference's refiner round-trips to the host every iteration: Panda3D
renders on CPU workers, tensors cross the PCIe bus, the net runs on GPU
(src/megapose/inference/pose_estimator.py:102-216 +
panda3d_renderer/panda3d_batch_renderer.py:215-290). On the TPU relay those
transfers SERIALIZE with compute, so the host-render path pays
(device->host pose fetch) + (host raster) + (render upload) x n_iterations
per batch. This module removes the round trips entirely: meshes are packed
into fixed-shape device arrays once, and the jittable `render_rgb` below
rasterizes every hypothesis ON the TPU with render/jax_renderer.rasterize —
the whole 5-iteration refine loop then compiles into ONE XLA program
(refiner.RenderCompareRefiner.refine_batch_device).

Fixed-shape packing (XLA needs static shapes):
- faces are padded to a common multiple-of-`chunk` maximum with (0,0,0)
  degenerate rows (zero area -> never win a pixel, jax_renderer.py:246);
- vertices are padded by repeating each mesh's last vertex (only referenced
  by padded faces, which never rasterize);
- vertices are PRE-SCALED to meters (MeshStore.unit_to_m), so the loop's
  metric TCO poses apply directly with no per-call unit conversion.

Cost model: the rasterizer's scan evaluates `chunk` triangles against the
full HxW grid per step — VPU work linear in F_max. Packing to the max face
count across labels means small meshes pay the largest mesh's raster cost;
acceptable for BOP-style meshes (same order of magnitude), documented here
for the pathological mixed-size case.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gigapose_tpu.render.jax_renderer import load_mesh, rasterize


@dataclasses.dataclass(frozen=True)
class DeviceMeshes:
    """Stacked fixed-shape mesh arrays, one row per label."""

    verts: jnp.ndarray  # (L, Vmax, 3) f32, METERS
    faces: jnp.ndarray  # (L, Fmax, 3) i32, padded rows (0,0,0)
    colors: jnp.ndarray  # (L, Vmax, 3) f32 albedo in [0, 255]
    label_to_row: Dict[int, int]  # host-side label -> row index
    chunk: int

    def rows_for(self, labels: np.ndarray) -> np.ndarray:
        return np.asarray([self.label_to_row[int(l)] for l in labels], np.int32)


def decimate_vertex_clustering(
    verts: np.ndarray, faces: np.ndarray, colors: np.ndarray, max_faces: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic grid vertex-clustering decimation to <= max_faces.

    The device rasterizer's cost is linear in the face count (every triangle
    is evaluated against the full pixel grid — device_render module
    docstring), while a 160x160 render-and-compare crop resolves ~1e4
    foreground pixels: faces beyond a few thousand are sub-pixel. Vertices
    snap to the FINEST uniform grid whose cluster mesh fits the budget
    (positions/colors cluster-averaged, degenerate faces dropped) — the
    standard vertex-clustering scheme (Rossignac & Borrel '93), chosen over
    edge-collapse for determinism and O(V) cost."""
    if len(faces) <= max_faces:
        return verts, faces, colors
    lo = verts.min(0)
    extent = float((verts.max(0) - lo).max()) + 1e-12
    for cells in (512, 384, 256, 192, 128, 96, 64, 48, 32, 24, 16, 12, 8, 6, 4):
        size = extent / cells
        key = np.floor((verts - lo) / size).astype(np.int64)
        _, inv = np.unique(key, axis=0, return_inverse=True)
        nf = inv[faces]
        good = (
            (nf[:, 0] != nf[:, 1]) & (nf[:, 1] != nf[:, 2]) & (nf[:, 0] != nf[:, 2])
        )
        nf = nf[good]
        if len(nf) <= max_faces:
            n = int(inv.max()) + 1
            nv = np.zeros((n, 3), np.float64)
            nc = np.zeros((n, 3), np.float64)
            cnt = np.zeros(n, np.float64)
            np.add.at(nv, inv, verts)
            np.add.at(nc, inv, colors)
            np.add.at(cnt, inv, 1.0)
            nv /= cnt[:, None]
            nc /= cnt[:, None]
            return (nv.astype(np.float32), nf.astype(np.int32),
                    nc.astype(np.float32))
    raise AssertionError("decimation failed to reach the face budget")


def build_device_meshes(
    mesh_paths: Dict[int, str],
    unit_to_m: Dict[int, float],
    chunk: int = 64,
    max_faces: int = None,
) -> DeviceMeshes:
    """Load + pad + scale every mesh into one stacked device-resident pack.

    max_faces: optional per-mesh decimation budget for the on-device raster
    (see decimate_vertex_clustering) — the host C++ raster path always uses
    the exact mesh."""
    loaded = {}
    for label, path in mesh_paths.items():
        verts, faces, colors = load_mesh(path)
        verts = verts.astype(np.float32) * np.float32(unit_to_m[label])
        if colors is None:
            colors = np.full((len(verts), 3), 200, np.uint8)  # grey default
        colors = colors.astype(np.float32)
        faces = faces.astype(np.int32)
        if max_faces is not None:
            verts, faces, colors = decimate_vertex_clustering(
                verts, faces, colors, max_faces)
        loaded[label] = (verts, faces, colors)
    v_max = max(len(v) for v, _, _ in loaded.values())
    f_max = max(len(f) for _, f, _ in loaded.values())
    f_max += (-f_max) % chunk
    labels = sorted(loaded)
    V, F, C = [], [], []
    for label in labels:
        verts, faces, colors = loaded[label]
        vpad = v_max - len(verts)
        if vpad:
            verts = np.concatenate([verts, np.repeat(verts[-1:], vpad, 0)])
            colors = np.concatenate([colors, np.repeat(colors[-1:], vpad, 0)])
        fpad = f_max - len(faces)
        if fpad:
            faces = np.concatenate([faces, np.zeros((fpad, 3), np.int32)])
        V.append(verts)
        F.append(faces)
        C.append(colors)
    return DeviceMeshes(
        verts=jnp.asarray(np.stack(V)),
        faces=jnp.asarray(np.stack(F)),
        colors=jnp.asarray(np.stack(C)),
        label_to_row={label: i for i, label in enumerate(labels)},
        chunk=chunk,
    )


def render_rgb(
    verts: jnp.ndarray,  # (B, Vmax, 3) f32 meters (pre-gathered per sample)
    faces: jnp.ndarray,  # (B, Fmax, 3) i32
    colors: jnp.ndarray,  # (B, Vmax, 3) f32
    K: jnp.ndarray,  # (B, 3, 3)
    TCO: jnp.ndarray,  # (B, 4, 4) meters
    size: Tuple[int, int],
    chunk: int,
) -> jnp.ndarray:
    """Jittable batch render -> (B, 3, H, W) f32 in [0, 1], matching the
    host path's u8-quantized RGB contract (MeshStore.render_batch)."""
    H, W = size

    def one(v, f, c, Ki, Ti):
        out = rasterize(v, f, c, Ki, Ti, width=W, height=H, chunk=chunk)
        rgb = out["rgba"][..., :3].astype(jnp.float32) / 255.0  # (H, W, 3)
        return jnp.transpose(rgb, (2, 0, 1))

    return jax.vmap(one)(verts, faces, colors, K, TCO)
