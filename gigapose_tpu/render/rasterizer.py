"""ctypes binding for the native C++ rasterizer (native/rasterizer.cpp).

Replaces the reference's Panda3D/BlenderProc render CLIs (SURVEY §2.5,
src/custom_megapose/call_panda3d.py:15-104, src/lib3d/blenderproc.py:85-143)
with an in-process native renderer behind the same contract:
(cad_path, poses, K) -> per-view RGBA uint8 + depth (mm as uint16 at save
time). Builds the shared library on demand with g++ (no pybind11 needed).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional, Tuple

import numpy as np

from gigapose_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))), "native")
_LIB_PATH = osp.join(_NATIVE_DIR, "librasterizer.so")
_lib = None


def _build_library():
    logger.info("Building native rasterizer ...")
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)


def _load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_LIB_PATH) or osp.getmtime(_LIB_PATH) < osp.getmtime(
        osp.join(_NATIVE_DIR, "rasterizer.cpp")
    ):
        _build_library()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.grast_load_mesh.restype = ctypes.c_void_p
    lib.grast_load_mesh.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    lib.grast_free_mesh.argtypes = [ctypes.c_void_p]
    lib.grast_mesh_diameter.restype = ctypes.c_double
    lib.grast_mesh_diameter.argtypes = [ctypes.c_void_p]
    lib.grast_mesh_center.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.grast_num_vertices.restype = ctypes.c_int
    lib.grast_num_vertices.argtypes = [ctypes.c_void_p]
    lib.grast_render.restype = ctypes.c_int
    lib.grast_render.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.grast_render2.restype = ctypes.c_int
    lib.grast_render2.argtypes = lib.grast_render.argtypes + [
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


class Rasterizer:
    """One loaded mesh; render views with arbitrary K / pose / size."""

    def __init__(self, mesh_path: str):
        self._lib = _load_library()
        status = ctypes.c_int(0)
        self._handle = self._lib.grast_load_mesh(
            mesh_path.encode(), ctypes.byref(status)
        )
        if status.value != 0 or not self._handle:
            raise IOError(f"Failed to load mesh: {mesh_path}")
        self.mesh_path = mesh_path

    @property
    def diameter(self) -> float:
        return float(self._lib.grast_mesh_diameter(self._handle))

    @property
    def center(self) -> np.ndarray:
        out = (ctypes.c_float * 3)()
        self._lib.grast_mesh_center(self._handle, out)
        return np.asarray(out, np.float32)

    @property
    def num_vertices(self) -> int:
        return int(self._lib.grast_num_vertices(self._handle))

    def render(
        self, K: np.ndarray, pose: np.ndarray, width: int = 640, height: int = 480
    ) -> Tuple[np.ndarray, np.ndarray]:
        """K (3,3), pose (4,4) object->camera in mesh units.
        Returns (rgba (H,W,4) uint8, depth (H,W) float32 camera units)."""
        rgba, depth, _ = self.render_full(K, pose, width, height, normals=False)
        return rgba, depth

    def render_full(
        self,
        K: np.ndarray,
        pose: np.ndarray,
        width: int = 640,
        height: int = 480,
        normals: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
        """Like render() but optionally also returns per-pixel unit
        camera-space face normals (H,W,3) float32 (0 on background) — the
        normals pass megapose's refiner inputs use (reference:
        panda3d_scene_renderer.py:214-223 use_normals_texture)."""
        K32 = np.ascontiguousarray(K, np.float32)
        T32 = np.ascontiguousarray(pose, np.float32)
        nrm = np.zeros((height, width, 3), np.float32) if normals else None
        if not np.isfinite(T32).all():
            # NaN-pose guard: render nothing (ref: panda3d_batch_renderer
            # worker_loop guard, :108-134)
            return (
                np.zeros((height, width, 4), np.uint8),
                np.zeros((height, width), np.float32),
                nrm,
            )
        rgba = np.zeros((height, width, 4), np.uint8)
        depth = np.zeros((height, width), np.float32)
        rc = self._lib.grast_render2(
            self._handle,
            K32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            T32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            width,
            height,
            rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nrm.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            if nrm is not None
            else None,
        )
        if rc != 0:
            raise RuntimeError(f"render failed rc={rc}")
        return rgba, depth, nrm

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.grast_free_mesh(self._handle)
        except Exception:
            pass


def render_template_views(
    mesh_path: str,
    out_dir: str,
    poses: Optional[np.ndarray] = None,
    K: Optional[np.ndarray] = None,
    width: int = 640,
    height: int = 480,
    level: int = 1,
    radius_factor: float = 0.4,
    mesh_unit_to_mm: Optional[float] = None,
) -> int:
    """Render the icosphere template set of one object (the render_bop_templates
    contract, src/scripts/render_bop_templates.py:57-131): {view:06d}.png RGBA +
    {view:06d}_depth.png uint16 mm, plus the pose npy saved by the caller.

    Default poses: level-1 icosphere object poses scaled to radius_factor (the
    reference's x0.4 zoom at :69-70) in mm; mesh units are auto-detected from
    the mesh diameter when mesh_unit_to_mm is None (ref: call_panda3d.py mesh
    unit inference from diameter).
    """
    from PIL import Image

    from gigapose_tpu.lib3d.icosphere import template_object_poses
    from gigapose_tpu.pipeline.templates import TEMPLATE_K

    r = Rasterizer(mesh_path)
    if mesh_unit_to_mm is None:
        d = r.diameter
        mesh_unit_to_mm = 1000.0 if d < 5.0 else 1.0  # meters vs mm meshes
    if poses is None:
        poses = template_object_poses(level).copy()
        poses[:, :3, 3] *= radius_factor  # object at 0.4 m like the reference
    if K is None:
        K = TEMPLATE_K
    os.makedirs(out_dir, exist_ok=True)
    for v, pose in enumerate(poses):
        p = pose.copy()
        p[:3, 3] /= mesh_unit_to_mm  # translation into mesh units
        rgba, depth = r.render(K, p, width, height)
        Image.fromarray(rgba).save(osp.join(out_dir, f"{v:06d}.png"))
        depth_mm = np.clip(depth * mesh_unit_to_mm, 0, 65535).astype(np.uint16)
        Image.fromarray(depth_mm).save(osp.join(out_dir, f"{v:06d}_depth.png"))
    return len(poses)
