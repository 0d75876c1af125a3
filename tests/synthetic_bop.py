"""Synthetic BOP-format dataset fixture: a textured-square 'object' with
templates, one test scene, CNOS-style detections, targets. Exercises the full
disk contract of the inference pipeline without real BOP data."""

import json
import os
import os.path as osp

import numpy as np
from PIL import Image

from gigapose_tpu.dataloader import bop_io

DS = "tudl"  # a core-19 dataset name so the detection registry resolves
OBJ_ID = 1
NUM_OBJECTS = 2  # a second object exercises multi-object label indexing


def build(root: str, num_templates: int = 8, img_hw=(480, 640), obj_px=120,
          n_test_images: int = 1, insts_per_image: int = None):
    """Defaults reproduce the original single-test-image fixture exactly.
    n_test_images / insts_per_image (up to 8 grid slots) scale the TEST
    split for end-to-end wall-clock benchmarking (bench.py mode=e2e)."""
    rng = np.random.default_rng(0)
    datasets = osp.join(root, "datasets")
    H, W = img_hw

    # --- per-object textures (same every view; enough for retrieval smoke)
    textures = [
        (rng.uniform(0.2, 1.0, size=(obj_px, obj_px, 3)) * 255).astype(np.uint8)
        for _ in range(NUM_OBJECTS)
    ]
    texture = textures[0]

    # --- templates: RGBA 480x640 with the texture centered
    pose_dir = osp.join(datasets, "templates", DS, "object_poses")
    os.makedirs(pose_dir, exist_ok=True)
    y0, x0 = (H - obj_px) // 2, (W - obj_px) // 2
    poses = np.tile(np.eye(4), (num_templates, 1, 1))
    poses[:, 2, 3] = 400.0  # mm
    for obj_id in range(1, NUM_OBJECTS + 1):
        tdir = osp.join(datasets, "templates", DS, f"{obj_id:06d}")
        os.makedirs(tdir, exist_ok=True)
        tex = textures[obj_id - 1]
        for v in range(num_templates):
            rgba = np.zeros((H, W, 4), np.uint8)
            rgba[y0 : y0 + obj_px, x0 : x0 + obj_px, :3] = tex
            rgba[y0 : y0 + obj_px, x0 : x0 + obj_px, 3] = 255
            Image.fromarray(rgba).save(osp.join(tdir, f"{v:06d}.png"))
            depth = np.zeros((H, W), np.uint16)
            depth[y0 : y0 + obj_px, x0 : x0 + obj_px] = 400
            Image.fromarray(depth).save(osp.join(tdir, f"{v:06d}_depth.png"))
        np.save(osp.join(pose_dir, f"{obj_id:06d}.npy"), poses)

    # --- test scene(s) with objects pasted at non-overlapping grid slots
    scene_dir = osp.join(datasets, DS, "test", "000001")
    os.makedirs(osp.join(scene_dir, "rgb"), exist_ok=True)
    # legacy layout: object 1 top-right, object 2 bottom-left
    slots = [(100, 380), (280, 80)]
    n_inst = insts_per_image or NUM_OBJECTS
    if n_inst > 2:
        slots = [(y, x) for y in (60, 280) for x in (20, 180, 340, 500)]
    assert n_inst <= len(slots)
    K = [572.4114, 0.0, 320.0, 0.0, 573.57043, 240.0, 0.0, 0.0, 1.0]
    cams, dets, targets = {}, [], []
    for im in range(n_test_images):
        img = (rng.uniform(0, 0.15, size=(H, W, 3)) * 255).astype(np.uint8)
        placed = []
        for j in range(n_inst):
            obj_id = 1 + j % NUM_OBJECTS
            qy, qx = slots[j]
            img[qy : qy + obj_px, qx : qx + obj_px] = textures[obj_id - 1]
            placed.append((obj_id, qy, qx))
        Image.fromarray(img).save(osp.join(scene_dir, "rgb", f"{im:06d}.png"))
        cams[str(im)] = {"cam_K": K, "depth_scale": 1.0}
        counts = {}
        for obj_id, qy, qx in placed:
            mask = np.zeros((H, W), np.uint8)
            mask[qy : qy + obj_px, qx : qx + obj_px] = 1
            dets.append(
                {
                    "scene_id": 1,
                    "image_id": im,
                    "category_id": obj_id,
                    "score": 0.95,
                    "bbox": [qx, qy, obj_px, obj_px],
                    "segmentation": bop_io.rle_encode(mask),
                    "time": 0.12,
                }
            )
            counts[obj_id] = counts.get(obj_id, 0) + 1
        for obj_id, cnt in sorted(counts.items()):
            targets.append(
                {"scene_id": 1, "im_id": im, "obj_id": obj_id,
                 "inst_count": cnt}
            )
    with open(osp.join(scene_dir, "scene_camera.json"), "w") as f:
        json.dump(cams, f)
    det_dir = osp.join(
        datasets, "default_detections", "core19_model_based_unseen", "cnos-fastsam"
    )
    os.makedirs(det_dir, exist_ok=True)
    with open(osp.join(det_dir, f"cnos-fastsam_{DS}-test_fixture.json"), "w") as f:
        json.dump(dets, f)
    with open(osp.join(datasets, DS, "test_targets_bop19.json"), "w") as f:
        json.dump(targets, f)

    # --- a small training split (dir layout with depth + masks + gt)
    tr = osp.join(datasets, DS, "train_pbr", "000001")
    os.makedirs(osp.join(tr, "rgb"), exist_ok=True)
    os.makedirs(osp.join(tr, "depth"), exist_ok=True)
    os.makedirs(osp.join(tr, "mask_visib"), exist_ok=True)
    cams, gts, infos = {}, {}, {}
    y0c, x0c = (H - obj_px) // 2, (W - obj_px) // 2
    for im in range(3):
        img = (rng.uniform(0, 0.15, size=(H, W, 3)) * 255).astype(np.uint8)
        img[y0c : y0c + obj_px, x0c : x0c + obj_px] = texture
        Image.fromarray(img).save(osp.join(tr, "rgb", f"{im:06d}.png"))
        depth = np.zeros((H, W), np.uint16)
        depth[y0c : y0c + obj_px, x0c : x0c + obj_px] = 400  # mm
        Image.fromarray(depth).save(osp.join(tr, "depth", f"{im:06d}.png"))
        m = np.zeros((H, W), np.uint8)
        m[y0c : y0c + obj_px, x0c : x0c + obj_px] = 255
        Image.fromarray(m).save(osp.join(tr, "mask_visib", f"{im:06d}_000000.png"))
        cams[str(im)] = {"cam_K": K, "depth_scale": 1.0}
        gts[str(im)] = [
            {"obj_id": OBJ_ID,
             "cam_R_m2c": np.eye(3).reshape(-1).tolist(),
             "cam_t_m2c": [0.0, 0.0, 400.0]}
        ]
        infos[str(im)] = [
            {"bbox_visib": [x0c, y0c, obj_px, obj_px], "visib_fract": 1.0}
        ]
    for name, data in [("scene_camera", cams), ("scene_gt", gts),
                       ("scene_gt_info", infos)]:
        with open(osp.join(tr, f"{name}.json"), "w") as f:
            json.dump(data, f)

    # --- CAD model for the refiner (a small cube, meters)
    from tests.test_rasterizer import _write_cube_ply

    models = osp.join(datasets, DS, "models")
    os.makedirs(models, exist_ok=True)
    for obj_id in range(1, NUM_OBJECTS + 1):
        _write_cube_ply(osp.join(models, f"obj_{obj_id:06d}.ply"), size=0.08)
    return root


def build_rendered(root: str, n_train: int = 40, level: int = 0, seed: int = 0,
                   obj_size_mm: float = 80.0):
    """A fully *rendered* BOP fixture: one colored-cube object; templates,
    train scenes, and the test scene all come from the native rasterizer, so
    viewpoint/scale/in-plane variation is real 3D geometry (unlike build()'s
    pasted texture). Units: mm on disk (BOP convention).

    Returns (root, gt_test_pose_mm (4,4))."""
    from scipy.spatial.transform import Rotation

    from gigapose_tpu.lib3d.icosphere import template_object_poses
    from gigapose_tpu.render.rasterizer import Rasterizer, render_template_views
    from tests.test_rasterizer import _write_cube_ply

    rng = np.random.default_rng(seed)
    datasets = osp.join(root, "datasets")
    K = np.array([[572.4114, 0, 320], [0, 573.57043, 240], [0, 0, 1.0]])
    K_list = K.reshape(-1).tolist()

    # --- CAD (mm units, vertex-colored so viewpoints are distinguishable)
    models = osp.join(datasets, DS, "models")
    os.makedirs(models, exist_ok=True)
    mesh_path = osp.join(models, f"obj_{OBJ_ID:06d}.ply")
    _write_cube_ply(mesh_path, size=obj_size_mm, colors=True)

    # --- templates (rendered) + poses
    tdir = osp.join(datasets, "templates", DS, f"{OBJ_ID:06d}")
    render_template_views(mesh_path, tdir, level=level)
    pose_dir = osp.join(datasets, "templates", DS, "object_poses")
    os.makedirs(pose_dir, exist_ok=True)
    poses = template_object_poses(level).copy()
    poses[:, :3, 3] *= 0.4  # 400 mm
    np.save(osp.join(pose_dir, f"{OBJ_ID:06d}.npy"), poses)

    r = Rasterizer(mesh_path)

    def sample_pose(rs):
        T = np.eye(4)
        T[:3, :3] = Rotation.random(random_state=rs).as_matrix()
        T[0, 3] = rng.uniform(-40, 40)
        T[1, 3] = rng.uniform(-30, 30)
        T[2, 3] = rng.uniform(350, 550)
        return T

    def write_scene(split, image_poses):
        sdir = osp.join(datasets, DS, split, "000001")
        for sub in ("rgb", "depth", "mask_visib"):
            os.makedirs(osp.join(sdir, sub), exist_ok=True)
        cams, gts, infos = {}, {}, {}
        for im, T in enumerate(image_poses):
            rgba, depth = r.render(K, T.astype(np.float32), 640, 480)
            rgb = rgba[..., :3].copy()
            bg = rgba[..., 3] == 0
            rgb[bg] = (rng.uniform(0, 0.1, (int(bg.sum()), 3)) * 255).astype(np.uint8)
            Image.fromarray(rgb).save(osp.join(sdir, "rgb", f"{im:06d}.png"))
            Image.fromarray(np.clip(depth, 0, 65535).astype(np.uint16)).save(
                osp.join(sdir, "depth", f"{im:06d}.png")
            )
            mask = ((rgba[..., 3] > 0) * 255).astype(np.uint8)
            Image.fromarray(mask).save(
                osp.join(sdir, "mask_visib", f"{im:06d}_000000.png")
            )
            ys, xs = np.nonzero(mask)
            bbox = [int(xs.min()), int(ys.min()),
                    int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)]
            cams[str(im)] = {"cam_K": K_list, "depth_scale": 1.0}
            gts[str(im)] = [{
                "obj_id": OBJ_ID,
                "cam_R_m2c": T[:3, :3].reshape(-1).tolist(),
                "cam_t_m2c": T[:3, 3].tolist(),
            }]
            infos[str(im)] = [{"bbox_visib": bbox, "visib_fract": 1.0}]
        for name, data in [("scene_camera", cams), ("scene_gt", gts),
                           ("scene_gt_info", infos)]:
            with open(osp.join(sdir, f"{name}.json"), "w") as f:
                json.dump(data, f)
        return sdir

    write_scene("train_pbr", [sample_pose(rng.integers(1 << 30)) for _ in range(n_train)])

    # --- test scene: one held-out pose + CNOS-style detection
    gt_test = sample_pose(12345)
    write_scene("test", [gt_test])
    rgba, _ = r.render(K, gt_test.astype(np.float32), 640, 480)
    mask = (rgba[..., 3] > 0).astype(np.uint8)
    ys, xs = np.nonzero(mask)
    det = {
        "scene_id": 1, "image_id": 0, "category_id": OBJ_ID, "score": 0.95,
        "bbox": [int(xs.min()), int(ys.min()),
                 int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)],
        "segmentation": bop_io.rle_encode(mask),
        "time": 0.1,
    }
    det_dir = osp.join(
        datasets, "default_detections", "core19_model_based_unseen", "cnos-fastsam"
    )
    os.makedirs(det_dir, exist_ok=True)
    with open(osp.join(det_dir, f"cnos-fastsam_{DS}-test_fixture.json"), "w") as f:
        json.dump([det], f)
    with open(osp.join(datasets, DS, "test_targets_bop19.json"), "w") as f:
        json.dump([{"scene_id": 1, "im_id": 0, "obj_id": OBJ_ID, "inst_count": 1}], f)
    return root, gt_test
