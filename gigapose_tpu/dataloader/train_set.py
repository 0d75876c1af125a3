"""Training data pipeline: scenes + templates -> TrainBatch.

Rebuild of GigaPoseTrainSet (src/dataloader/train.py:44-279) split TPU-first:

HOST (this module's TrainLoader): stream scenes (tar shards / dirs), PIL rgb
augmentation, instance sampling, nearest-template search (+ random in-plane
with PIL image rotation), single-view template PNG loads — the cheap,
latency-bound work.

DEVICE (prepare_train_batch, jit): masked-RGBA crops of both views, CLIP
normalization, GT keypoint sampling (unproject/SE3/reproject), relative
scale/in-plane GT — the pixel- and geometry-heavy work the reference did per
worker in torch.

Units: everything METERS on the training path (scene GT is converted by
scene.py; template poses/depth are scaled by the loader's unit_scale).
"""

from __future__ import annotations

import dataclasses
import os.path as osp
from typing import Dict, Iterator, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from gigapose_tpu.dataloader.augment import RgbAugmentConfig, augment_rgb, rotate_rgba
from gigapose_tpu.dataloader.scene import DirSceneSource, SceneObservation, TarSceneSource
from gigapose_tpu.dataloader.templates_disk import load_object_templates
from gigapose_tpu.lib3d.icosphere import template_object_poses
from gigapose_tpu.lib3d.affine import apply_affine, inverse_crop_affine
from gigapose_tpu.dataloader.keypoints import KeypointView, sample_keypoints
from gigapose_tpu.lib3d.geometry import relative_inplane, relative_scale
from gigapose_tpu.ops.crop import crop_resize_pad
from gigapose_tpu.pipeline.templates import TEMPLATE_K, normalize_rgb
from gigapose_tpu.training.state import TrainBatch
from gigapose_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def nearest_view_index(R_query: np.ndarray, view_poses: np.ndarray) -> int:
    """Nearest out-of-plane template view by z-row distance (the OpenGL-flip
    invariant argmin of NearestTemplateFinder, template_transform.py:137-154)."""
    d = np.linalg.norm(view_poses[:, 2, :3] - R_query[2, :3], axis=1)
    return int(np.argmin(d))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HostTrainRecords:
    """Numpy batch the host loader yields; device prep turns it into TrainBatch."""

    q_rgb: np.ndarray  # (B, 3, H, W) [0,1] augmented
    q_depth: np.ndarray  # (B, H, W) meters
    q_mask: np.ndarray  # (B, H, W)
    q_K: np.ndarray  # (B, 3, 3)
    q_pose: np.ndarray  # (B, 4, 4) meters
    q_box: np.ndarray  # (B, 4) xyxy
    t_rgba: np.ndarray  # (B, 4, Ht, Wt) [0,1]
    t_depth: np.ndarray  # (B, Ht, Wt) meters
    t_K: np.ndarray  # (B, 3, 3)
    t_pose: np.ndarray  # (B, 4, 4) meters (in-plane composed)
    t_box: np.ndarray  # (B, 4) xyxy


class TrainLoader:
    """Iterates HostTrainRecords of a fixed batch size over BOP-format scenes."""

    def __init__(
        self,
        scene_source,
        template_dir: str,
        batch_size: int = 12,
        inplane_augmentation: bool = True,
        rgb_augmentation: bool = True,
        unit_scale: float = 1e-3,  # template pose/depth (mm) -> meters
        template_scale_factor: float = 1.0,
        seed: int = 2023,
        min_box_size: float = 10.0,
        num_workers: int = 1,
    ):
        self.scenes = scene_source
        self.template_dir = template_dir
        self.batch_size = batch_size
        self.inplane_aug = inplane_augmentation
        self.rgb_aug = rgb_augmentation
        self.unit_scale = unit_scale
        self.scale_factor = template_scale_factor
        self.rng = np.random.default_rng(seed)
        self.min_box_size = min_box_size
        # decode/augment worker threads (the reference's 10 DataLoader
        # workers + wds.split_by_worker, web_scene_dataset.py:211). PIL
        # decode releases the GIL, so threads parallelize for real on
        # multi-core hosts; num_workers<=1 is the sequential path (the
        # correct choice on this 1-core box). Determinism: each observation
        # gets a child seed drawn sequentially from the master stream, so
        # the sample sequence is independent of worker count.
        self.num_workers = num_workers
        self._pose_cache: Dict[int, np.ndarray] = {}

    def _view_poses(self, obj_id: int) -> np.ndarray:
        if obj_id not in self._pose_cache:
            path = osp.join(self.template_dir, "object_poses", f"{obj_id:06d}.npy")
            poses = np.load(path).astype(np.float64)
            poses[:, :3, 3] *= self.scale_factor
            self._pose_cache[obj_id] = poses
        return self._pose_cache[obj_id]

    def _load_template_view(self, obj_id: int, view: int, inplane_deg: float):
        from PIL import Image

        obj_dir = osp.join(self.template_dir, f"{obj_id:06d}")
        rgba = np.asarray(
            Image.open(osp.join(obj_dir, f"{view:06d}.png")).convert("RGBA"),
            np.float32,
        ) / 255.0
        depth = np.asarray(
            Image.open(osp.join(obj_dir, f"{view:06d}_depth.png")), np.float32
        )
        if inplane_deg:
            rgba = rotate_rgba(rgba, inplane_deg)
            depth = np.asarray(
                Image.fromarray(depth).rotate(inplane_deg), np.float32
            )
        return rgba.transpose(2, 0, 1), depth * self.unit_scale

    def _instances(self, obs: SceneObservation, rng) -> List[int]:
        n = len(obs.object_ids)
        ok = [
            i for i in range(n)
            if min(obs.bboxes_xywh[i][2], obs.bboxes_xywh[i][3]) >= self.min_box_size
        ]
        if len(ok) > self.batch_size:
            ok = list(rng.choice(ok, self.batch_size, replace=False))
        return ok

    def _obs_records(self, obs: SceneObservation, rng) -> List[Dict]:
        """All heavy per-observation host work (rgb aug, template PNG decode,
        inplane rotation) — the unit parallelized across loader workers."""
        rgb = augment_rgb(obs.rgb, rng) if self.rgb_aug else obs.rgb
        rgb = rgb.astype(np.float32).transpose(2, 0, 1) / 255.0
        records: List[Dict] = []
        for i in self._instances(obs, rng):
            obj_id = obs.object_ids[i]
            try:
                view_poses = self._view_poses(obj_id)
            except FileNotFoundError:
                continue
            v = nearest_view_index(obs.poses[i][:3, :3], view_poses)
            inplane = float(rng.integers(0, 360)) if self.inplane_aug else 0.0
            try:
                t_rgba, t_depth = self._load_template_view(obj_id, v, inplane)
            except FileNotFoundError:
                continue
            t_pose = view_poses[v].copy() * 1.0
            t_pose[:3, 3] *= self.unit_scale  # -> meters
            if inplane:
                a = np.deg2rad(-inplane)
                Rz = np.array(
                    [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1.0]]
                )
                T = np.eye(4)
                T[:3, :3] = Rz
                t_pose = T @ t_pose
            alpha = t_rgba[3]
            ys, xs = np.nonzero(alpha > 0)
            if len(ys) == 0:
                continue
            t_box = np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
            x, y, w, h = obs.bboxes_xywh[i]
            q_box = np.array([x, y, x + w, y + h])
            records.append(
                dict(
                    q_rgb=rgb, q_depth=obs.depth, q_mask=obs.masks[i],
                    q_K=obs.K, q_pose=obs.poses[i], q_box=q_box,
                    t_rgba=t_rgba, t_depth=t_depth, t_K=TEMPLATE_K,
                    t_pose=t_pose, t_box=t_box,
                )
            )
        return records

    def _record_lists(self) -> Iterator[List[Dict]]:
        """Per-observation record lists, sequentially or through a bounded
        worker-thread window (order-preserving, stream-friendly)."""
        def seeded():
            for obs in self.scenes:
                if obs.depth is None or obs.masks is None:
                    continue
                yield obs, int(self.rng.integers(2**31))

        if self.num_workers <= 1:
            for obs, seed in seeded():
                yield self._obs_records(obs, np.random.default_rng(seed))
            return

        import collections
        from concurrent.futures import ThreadPoolExecutor

        window = self.num_workers * 2
        with ThreadPoolExecutor(self.num_workers) as ex:
            futs: collections.deque = collections.deque()
            it = seeded()
            exhausted = False
            while True:
                while not exhausted and len(futs) < window:
                    nxt = next(it, None)
                    if nxt is None:
                        exhausted = True
                        break
                    futs.append(
                        ex.submit(self._obs_records, nxt[0],
                                  np.random.default_rng(nxt[1]))
                    )
                if not futs:
                    return
                yield futs.popleft().result()

    def __iter__(self) -> Iterator[HostTrainRecords]:
        pending: List[Dict] = []
        for records in self._record_lists():
            for rec in records:
                pending.append(rec)
                if len(pending) == self.batch_size:
                    yield self._stack(pending)
                    pending = []

    def _stack(self, recs: List[Dict]) -> HostTrainRecords:
        f = lambda name: np.stack([np.asarray(r[name], np.float32) for r in recs])
        return HostTrainRecords(**{k: f(k) for k in recs[0]})


def prepare_train_batch(
    rec: HostTrainRecords, target_size: int = 224, patch_size: int = 14
) -> TrainBatch:
    """Device-side (jittable) batch prep: crops, normalization, GT keypoints,
    relative scale/in-plane (ref: collate_fn + process_* + KeyPointSampler)."""
    q_rgb = jnp.asarray(rec.q_rgb)
    q_mask = jnp.asarray(rec.q_mask)
    # masked RGBA query crop (ref: process_real, train.py:107-110)
    q_rgba = jnp.concatenate([q_rgb * q_mask[:, None], q_mask[:, None]], axis=1)
    q_crops, q_M = crop_resize_pad(q_rgba, jnp.asarray(rec.q_box), target_size)
    t_crops, t_M = crop_resize_pad(
        jnp.asarray(rec.t_rgba), jnp.asarray(rec.t_box), target_size
    )

    q_pose = jnp.asarray(rec.q_pose)
    t_pose = jnp.asarray(rec.t_pose)
    T_real2temp = jnp.einsum("bij,bjk->bik", t_pose, jnp.linalg.inv(q_pose))
    T_temp2real = jnp.linalg.inv(T_real2temp)

    # keypoints: for each REAL patch, its location in the TEMPLATE crop
    # (ref passes src=template, tar=real with T_tar2source=T_real2template;
    # our sampler's (src, tar) arguments are (real, template) accordingly)
    kp = sample_keypoints(
        T_real2temp,
        src=KeypointView(
            K=jnp.asarray(rec.q_K), depth=jnp.asarray(rec.q_depth),
            mask=q_crops[:, 3], M=q_M,
        ),
        tar=KeypointView(
            K=jnp.asarray(rec.t_K), depth=jnp.asarray(rec.t_depth),
            mask=t_crops[:, 3], M=t_M,
        ),
        tar_size=target_size,
        patch_size=patch_size,
    )
    rel_s = relative_scale(
        jnp.asarray(rec.t_K), jnp.asarray(rec.q_K), t_pose, q_pose, t_M, q_M
    )
    rel_i = relative_inplane(t_pose, q_pose)
    from gigapose_tpu.ops.matching import downsample_mask

    n_pat = target_size // patch_size
    return TrainBatch(
        src_img=normalize_rgb(t_crops[:, :3]),
        tar_img=normalize_rgb(q_crops[:, :3]),
        src_pts=kp["src_pts"],
        tar_pts=kp["tar_pts"],
        rel_scale=rel_s.astype(jnp.float32),
        rel_inplane=rel_i.astype(jnp.float32),
        src_mask=downsample_mask(t_crops[:, 3], n_pat),
        tar_mask=downsample_mask(q_crops[:, 3], n_pat),
    )
