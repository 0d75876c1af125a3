import os

import numpy as np

from gigapose_tpu.lib3d.icosphere import template_object_poses
from gigapose_tpu.lib3d.sampling import farthest_point_sampling, farthest_viewpoints


def test_fps_spreads_points():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(200, 3))
    sel, idx = farthest_point_sampling(pts, 10)
    assert len(np.unique(idx)) == 10
    # FPS min pairwise distance beats random selection's
    def min_pd(x):
        d = np.linalg.norm(x[:, None] - x[None], axis=-1)
        return d[~np.eye(len(x), dtype=bool)].min()

    rand = pts[rng.choice(200, 10, replace=False)]
    assert min_pd(sel) > min_pd(rand)


def test_farthest_viewpoints_on_templates():
    poses = template_object_poses(0)
    idx = farthest_viewpoints(poses, 8)
    assert len(np.unique(idx)) == 8
    dirs = poses[idx][:, 2, :3]
    d = np.linalg.norm(dirs[:, None] - dirs[None], axis=-1)
    assert d[~np.eye(8, dtype=bool)].min() > 0.5  # well spread on the sphere


def test_disable_output(tmp_path):
    import subprocess
    import sys

    code = (
        "from gigapose_tpu.utils.logging import disable_output;"
        f"disable_output(r'{tmp_path}/out.log');"
        "print('captured-line')"
    )
    subprocess.run(
        [sys.executable, "-c", code], cwd="/root/repo", check=True,
        env={**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"},
    )
    assert "captured-line" in open(tmp_path / "out.log").read()
