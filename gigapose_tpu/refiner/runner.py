"""Refinement runner: coarse csv -> refined BOP csv.

Rebuild of the reference's Refiner LightningModule + refine.py orchestration
(src/models/refiner.py:18-164, refine.py:20-78): per image, load the coarse
hypotheses (top-1 csv or top-k MultiHypothesis csv), run N render-and-compare
iterations, score each hypothesis, keep the best hypothesis per instance, and
write npz batches merged into the refined csv. Hypothesis score = average of
the coarse matching score and the scorer's pose score (refiner.py:124-131).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict, List, Optional

import numpy as np

from gigapose_tpu.dataloader import bop_io
from gigapose_tpu.dataloader.scene import DirSceneSource, TarSceneSource
from gigapose_tpu.refiner.refiner import RenderCompareRefiner
from gigapose_tpu.utils.logging import get_logger
from gigapose_tpu.utils.timer import Timer

logger = get_logger(__name__)


def find_init_pose_path(pred_dir: str, dataset_name: str, model_name: str,
                        run_id, use_multiple: bool = True) -> str:
    """Locate the coarse csv (ref: refiner_utils.find_init_pose_path)."""
    name = f"{model_name}-pbrreal-rgb-mmodel_{dataset_name}-test_{run_id}"
    suffix = "MultiHypothesis.csv" if use_multiple else ".csv"
    path = osp.join(pred_dir, f"{name}{suffix}")
    if not osp.exists(path):
        raise FileNotFoundError(path)
    return path


def run_refinement(
    refiner: RenderCompareRefiner,
    scene_source,
    init_loc_path: str,
    save_dir: str,
    dataset_name: str,
    model_name: str = "large",
    run_id="0",
    chunk_size: int = 8,
    max_images: Optional[int] = None,
    min_score: float = 0.25,
) -> List[str]:
    """Iterate test images, refine their hypotheses, merge the refined csv."""
    extra = None
    try:
        locs = bop_io.load_bop_csv(init_loc_path, extra_column="instance_id")
        extra = "instance_id"
    except Exception:
        locs = bop_io.load_bop_csv(init_loc_path)
        for i, r in enumerate(locs):
            r["instance_id"] = i
    locs_per_image = bop_io.group_by_image(locs, image_key="im_id")

    # drop whole instances whose best hypothesis is weak (test.py:110-140)
    for key, rows in locs_per_image.items():
        best: Dict[int, float] = {}
        for r in rows:
            iid = int(r["instance_id"])
            best[iid] = max(best.get(iid, -1e9), r["score"])
        locs_per_image[key] = [
            r for r in rows if best[int(r["instance_id"])] >= min_score
        ]

    pred_dir = osp.join(save_dir, "predictions_refined")
    os.makedirs(pred_dir, exist_ok=True)
    # multi-process refinement mirrors the coarse runner (and the reference's
    # PL-DDP trainer.test in refine.py): images split round-robin across
    # processes, shared-filesystem npz batches, rank-0 clean + merge
    from gigapose_tpu.parallel import multihost

    if multihost.is_primary():
        for f in os.listdir(pred_dir):
            if f.endswith(".npz"):
                os.remove(osp.join(pred_dir, f))
    multihost.barrier("refine-clean")
    import jax

    proc_id, n_proc = jax.process_index(), jax.process_count()

    def _iter_obs():
        """Random access via key_to_shard.json when the source supports it —
        refinement touches only images that actually carry hypotheses, so
        skipping the sequential decode of the rest is a real win on sparse
        refine sets (the reference reads per-key through the same index)."""
        keys = sorted(locs_per_image)
        index = getattr(scene_source, "key_index", None)
        if (
            hasattr(scene_source, "lookup")
            and index
            and all(k in index for k in keys)
        ):
            logger.info(f"Random-access refinement over {len(keys)} keys")
            for k in keys:
                obs = scene_source.lookup(k)
                if obs is not None:
                    yield obs
            return
        yield from scene_source

    timer = Timer()
    n_img = 0  # images THIS process refined
    n_seen = 0  # row-bearing images seen — identical on every process, so
    # max_images caps the TOTAL image count (like the coarse runner)
    for batch_id, obs in enumerate(_iter_obs()):
        key = obs.key
        rows = locs_per_image.get(key, [])
        if not rows:
            continue
        if max_images is not None and n_seen >= max_images:
            break
        n_seen += 1
        if batch_id % n_proc != proc_id:
            continue
        n_img += 1
        timer.tic()
        img = obs.rgb.astype(np.float32).transpose(2, 0, 1)[None] / 255.0
        B = len(rows)
        images = np.repeat(img, B, axis=0)
        K = np.tile(obs.K[None], (B, 1, 1)).astype(np.float32)
        labels = np.array([r["obj_id"] for r in rows], np.int32)
        TCO = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        for i, r in enumerate(rows):
            TCO[i, :3, :3] = r["R"]
            TCO[i, :3, 3] = np.asarray(r["t"]).reshape(3) / 1000.0  # mm -> m

        refined = np.zeros_like(TCO)
        pose_scores = np.zeros(B, np.float32)
        for s in range(0, B, chunk_size):
            e = min(s + chunk_size, B)
            refined[s:e], pose_scores[s:e] = refiner.refine_batch(
                images[s:e], K[s:e], labels[s:e], TCO[s:e]
            )
        elapsed = timer.toc()

        # keep the best hypothesis per instance; final score = mean of the
        # coarse matching score and the pose score (refiner.py:124-131)
        by_instance: Dict[int, List[int]] = {}
        for i, r in enumerate(rows):
            by_instance.setdefault(int(r["instance_id"]), []).append(i)
        sel, scores = [], []
        for iid, idxs in by_instance.items():
            best = max(idxs, key=lambda i: float(pose_scores[i]))
            sel.append(best)
            scores.append((rows[best]["score"] + float(pose_scores[best])) / 2)
        sel = np.asarray(sel)

        poses_mm = refined[sel].copy()
        poses_mm[:, :3, 3] *= 1000.0  # meters -> mm for the BOP csv
        np.savez(
            osp.join(pred_dir, f"{batch_id:06d}.npz"),
            scene_id=np.full(len(sel), obs.scene_id, np.int32),
            im_id=np.full(len(sel), obs.im_id, np.int32),
            object_id=labels[sel],
            poses=poses_mm,
            scores=np.asarray(scores),
            time=np.array([rows[i]["time"] for i in sel]),
            refinement_time=np.full(len(sel), elapsed),
        )
    logger.info(f"Refined {n_img} images")
    # all processes' npz files must exist before the rank-0 merge
    multihost.barrier("refine-merge")
    if not multihost.is_primary():
        return []
    return bop_io.merge_batched_predictions(
        pred_dir, dataset_name, model_name, run_id, is_refined=True
    )


def run_so3_coarse_refinement(
    refiner,  # MegaposeRefiner (needs classify_coarse)
    scene_source,
    root_dir: str,
    save_dir: str,
    dataset_name: str,
    model_name: str = "large",
    run_id="0",
    grid_size: int = 576,
    chunk_size: int = 8,
    max_images: Optional[int] = None,
    max_dets_per_image: int = 16,
) -> List[str]:
    """Detections-only pipeline: SO(3)-grid coarse hypothesis classification
    followed by render-and-compare refinement — the reference's
    forward_coarse_model path (src/megapose/inference/pose_estimator.py:322+),
    which GigaPose itself bypasses by supplying its own coarse poses. No init
    csv: hypotheses come from scoring every rotation of the M-point grid
    (assets/so3_grid_{72,576}.qua) per CNOS detection."""
    _, dets_per_image = bop_io.load_cnos_detections(
        root_dir, dataset_name, test_setting="detection"
    )

    pred_dir = osp.join(save_dir, "predictions_refined")
    os.makedirs(pred_dir, exist_ok=True)
    from gigapose_tpu.parallel import multihost

    if multihost.is_primary():
        for f in os.listdir(pred_dir):
            if f.endswith(".npz"):
                os.remove(osp.join(pred_dir, f))
    multihost.barrier("so3-clean")
    import jax

    proc_id, n_proc = jax.process_index(), jax.process_count()

    timer = Timer()
    n_img = 0
    n_seen = 0
    for batch_id, obs in enumerate(scene_source):
        dets = dets_per_image.get(obs.key, [])
        if not dets:
            continue
        if max_images is not None and n_seen >= max_images:
            break
        n_seen += 1
        if batch_id % n_proc != proc_id:
            continue
        n_img += 1
        dets = sorted(dets, key=lambda d: -d.get("score", 0.0))
        dets = dets[:max_dets_per_image]
        timer.tic()
        img = obs.rgb.astype(np.float32).transpose(2, 0, 1)[None] / 255.0
        B = len(dets)
        images = np.repeat(img, B, axis=0)
        K = np.tile(obs.K[None], (B, 1, 1)).astype(np.float32)
        labels = np.array(
            [int(d.get("category_id", d.get("obj_id"))) for d in dets], np.int32
        )
        boxes = np.zeros((B, 4), np.float32)  # COCO xywh -> xyxy
        for i, d in enumerate(dets):
            x, y, w, h = d["bbox"]
            boxes[i] = (x, y, x + w, y + h)

        TCO_init, _ = refiner.classify_coarse(
            images, K, labels, boxes, top_k=1, grid_size=grid_size
        )
        TCO_init = TCO_init[:, 0]  # (B, 4, 4)
        refined = np.zeros_like(TCO_init)
        pose_scores = np.zeros(B, np.float32)
        for s in range(0, B, chunk_size):
            e = min(s + chunk_size, B)
            refined[s:e], pose_scores[s:e] = refiner.refine_batch(
                images[s:e], K[s:e], labels[s:e], TCO_init[s:e]
            )
        elapsed = timer.toc()

        poses_mm = refined.copy()
        poses_mm[:, :3, 3] *= 1000.0
        np.savez(
            osp.join(pred_dir, f"{batch_id:06d}.npz"),
            scene_id=np.full(B, obs.scene_id, np.int32),
            im_id=np.full(B, obs.im_id, np.int32),
            object_id=labels,
            poses=poses_mm,
            scores=pose_scores,
            time=np.full(B, float(dets[0].get("time", 0.0))),
            refinement_time=np.full(B, elapsed),
        )
    logger.info(
        f"SO(3)-grid ({grid_size}) classified + refined {n_img} images"
    )
    multihost.barrier("so3-merge")
    if not multihost.is_primary():
        return []
    return bop_io.merge_batched_predictions(
        pred_dir, dataset_name, model_name, run_id, is_refined=True
    )
