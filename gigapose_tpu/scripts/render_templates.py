"""Template-rendering CLI: CAD models -> icosphere template sets on disk.

Rebuild of src/scripts/render_bop_templates.py:57-131 (and the gso/shapenet
drivers) without Blender/Panda3D subprocesses: the native C++ rasterizer
renders in-process, a worker pool parallelizes over objects, and outputs land
in the reference layout consumed by the rest of the framework:

    <out>/<obj:06d>/{view:06d}.png + {view:06d}_depth.png   (RGBA, uint16 mm)
    <out>/object_poses/<obj:06d>.npy                         ((V, 4, 4), mm)

Usage:
    python -m gigapose_tpu.scripts.render_templates \
        cad_dir=<models dir> out_dir=<templates/ds> [level=1] [num_workers=1] \
        [renderer=native|jax]

`renderer=jax` selects the alternative pure-JAX backend
(render/jax_renderer.py — the counterpart of the reference's pyrender
alternative, src/lib3d/pyrender.py): no compiled extension needed, and each
object's whole view stack rasterizes as one jitted/vmapped program on the
default JAX device.

Each object's output is verified to contain 2 x V files (the reference's
completeness check, render_bop_templates.py:49-54).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import os.path as osp
import sys

import numpy as np


def render_one(args):
    cad_path, out_dir, level, radius_factor, renderer = args
    if renderer == "jax":
        from gigapose_tpu.render.jax_renderer import (
            render_template_views_jax as render_template_views,
        )
    else:
        from gigapose_tpu.render.rasterizer import render_template_views

    n = render_template_views(cad_path, out_dir, level=level, radius_factor=radius_factor)
    files = os.listdir(out_dir)
    n_png = len([f for f in files if f.endswith(".png")])
    assert n_png == 2 * n, f"{out_dir}: expected {2*n} files, found {n_png}"
    return osp.basename(out_dir), n


def main(argv=None):
    from gigapose_tpu.lib3d.icosphere import template_object_poses

    overrides = dict(
        o.split("=", 1) for o in (argv if argv is not None else sys.argv[1:])
    )
    cad_dir = overrides["cad_dir"]
    out_dir = overrides["out_dir"]
    level = int(overrides.get("level", 1))
    radius_factor = float(overrides.get("radius_factor", 0.4))
    num_workers = int(overrides.get("num_workers", 1))
    renderer = overrides.get("renderer", "native")

    meshes = sorted(
        f for f in os.listdir(cad_dir) if f.endswith((".ply", ".obj"))
    )
    os.makedirs(osp.join(out_dir, "object_poses"), exist_ok=True)
    poses = template_object_poses(level).copy()
    poses[:, :3, 3] *= radius_factor  # mm, object at 0.4 m

    jobs = []
    for mesh in meshes:
        stem = osp.splitext(mesh)[0]  # e.g. obj_000001
        obj_id = int("".join(c for c in stem if c.isdigit()) or 0)
        obj_out = osp.join(out_dir, f"{obj_id:06d}")
        np.save(osp.join(out_dir, "object_poses", f"{obj_id:06d}.npy"), poses)
        jobs.append((osp.join(cad_dir, mesh), obj_out, level, radius_factor,
                     renderer))

    if num_workers > 1:
        with mp.Pool(num_workers) as pool:
            for name, n in pool.imap_unordered(render_one, jobs):
                print(f"rendered {name}: {n} views")
    else:
        for job in jobs:
            name, n = render_one(job)
            print(f"rendered {name}: {n} views")
    print(f"done: {len(jobs)} objects -> {out_dir}")


if __name__ == "__main__":
    main()
