"""Checkpoint-compatible megapose refiner / scorer / coarse classifier.

Wires the MegaposePoseHeadNet twins (refiner/megapose_net.py — numerically
validated against the reference torch modules) into the render-and-compare
orchestration, replacing the reference's released-model path:

- `MegaposeRefiner.refine_batch`   = PoseEstimator.forward_refiner over
  PosePredictor.forward (reference: src/megapose/inference/pose_estimator.py
  :102-216, src/megapose/models/pose_rigid.py:514-624), including the
  multi-view hypothesis rendering (make_TCO_multiview, pose_rigid.py:546).
- `MegaposeRefiner.score_batch`    = forward_scoring_model / forward_coarse
  (pose_estimator.py:219-320, pose_rigid.py:652-726).
- `MegaposeRefiner.classify_coarse`= forward_coarse_model: the 576-rotation
  SO(3)-grid hypothesis classifier (pose_estimator.py:322-480).
- `MegaposeRefiner.from_checkpoints` = load_pretrained_refiner
  (src/custom_megapose/refiner_utils.py:56-116): builds refiner + coarse nets
  from the released torch checkpoints via the tested converters.

Architecture contract of the released models (refiner-rgb-653307694 /
coarse-rgb-906902141, TrainingConfig defaults at
src/megapose/training/training_config.py:94-103): WideResNet-34 backbone,
render_size (240, 320) (pose_models_cfg.py:create_model_pose), inputs =
3 image channels + n_views * 6 render channels (rgb + normals),
n_rendered_views=1, depth off. Renders come from the native C++ rasterizer
(normals pass included); device math is jitted fixed-shape JAX.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gigapose_tpu.refiner import ops as R
from gigapose_tpu.refiner.megapose_net import (
    CONFIG,
    MegaposePoseHeadNet,
    megapose_pose_model_to_flax,
)
from gigapose_tpu.refiner.multiview import make_TCO_multiview
from gigapose_tpu.refiner.refiner import MeshStore
from gigapose_tpu.refiner.so3_grid import load_so3_grid
from gigapose_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclasses.dataclass(frozen=True)
class MegaposeRefinerConfig:
    n_iterations: int = 5
    render_size: Tuple[int, int] = (240, 320)
    lamb: float = 1.4
    n_rendered_views: int = 1
    multiview_type: str = "TCO+front_3views"
    render_normals: bool = True
    n_sample_points: int = 500
    so3_grid_size: int = 576
    bsz_objects: int = 8  # refine chunk (ref: configs/model/refiner/rgb.yaml)

    @property
    def n_render_channels(self) -> int:
        return 3 + (3 if self.render_normals else 0)

    @property
    def n_inputs(self) -> int:
        return 3 + self.n_render_channels * self.n_rendered_views


def _strip_torch(sd) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def change_keys_of_older_models(sd: Dict) -> Dict:
    """Key migration applied to the released checkpoints (reference:
    src/megapose/utils/models_compat.py:18-29)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("backbone.backbone"):
            k = "backbone." + k[len("backbone.backbone."):]
        elif k.startswith("backbone.head.0."):
            k = "views_logits_head." + k[len("backbone.head.0."):]
        out[k] = v
    return out


@dataclasses.dataclass
class MegaposeRefiner:
    """Render-and-compare refiner running the released megapose architecture."""

    refiner_net: MegaposePoseHeadNet
    refiner_vars: dict
    coarse_net: MegaposePoseHeadNet
    coarse_vars: dict
    meshes: MeshStore
    config: MegaposeRefinerConfig = MegaposeRefinerConfig()

    # ---------------------------------------------------------- constructors
    @classmethod
    def create(
        cls,
        mesh_paths: Dict[int, str],
        seed: int = 0,
        config: MegaposeRefinerConfig = MegaposeRefinerConfig(),
        layers=CONFIG[34],
        width: float = 1.0,
    ) -> "MegaposeRefiner":
        """Random-init nets with the released architecture (for training /
        smoke tests without the released weights)."""
        rnet = MegaposePoseHeadNet(layers=layers, width=width, head="pose")
        cnet = MegaposePoseHeadNet(
            layers=layers, width=width, head="renderings_logits",
            n_rendered_views=1,
        )
        H, W = config.render_size
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        rvars = rnet.init(k1, jnp.zeros((1, config.n_inputs, H, W)))
        # the coarse scorer always sees exactly one render (pose_rigid.py:
        # forward_coarse unsqueezes a single view, :700-712)
        cvars = cnet.init(k2, jnp.zeros((1, 3 + config.n_render_channels, H, W)))
        meshes = MeshStore(mesh_paths, config.n_sample_points)
        return cls(rnet, rvars, cnet, cvars, meshes, config)

    @classmethod
    def from_checkpoints(
        cls,
        refiner_ckpt: Optional[str],
        coarse_ckpt: Optional[str],
        mesh_paths: Dict[int, str],
        config: MegaposeRefinerConfig = MegaposeRefinerConfig(),
        layers=CONFIG[34],
        width: float = 1.0,
    ) -> "MegaposeRefiner":
        """Build from released torch checkpoints (checkpoint.pth.tar files;
        ref: refiner_utils.load_pretrained_refiner). Either path may be None
        to random-init that net."""
        out = cls.create(mesh_paths, config=config, layers=layers, width=width)

        def load(path, head):
            import torch

            ckpt = torch.load(path, map_location="cpu", weights_only=False)
            sd = ckpt.get("state_dict", ckpt)
            sd = change_keys_of_older_models(_strip_torch(sd))
            params, stats = megapose_pose_model_to_flax(sd, layers=layers, head=head)
            return {"params": params, "batch_stats": stats}

        if refiner_ckpt:
            out.refiner_vars = load(refiner_ckpt, "pose")
            logger.info(f"Loaded megapose refiner weights from {refiner_ckpt}")
        if coarse_ckpt:
            out.coarse_vars = load(coarse_ckpt, "renderings_logits")
            logger.info(f"Loaded megapose coarse weights from {coarse_ckpt}")
        return out

    # ------------------------------------------------------------ jit pieces
    _steps_cache: tuple = None

    def _device_steps(self):
        if self._steps_cache is not None:
            return self._steps_cache
        cfg = self.config

        @jax.jit
        def crop_step(images, K, TCO, points):
            """normalize_T + deepim crop of the observed image around the
            reference point (pose_rigid.crop_inputs, :182-254)."""
            TCO_n = R.normalize_T(TCO)
            tCR = TCO_n[:, :3, 3]
            uv = R.project_points_robust(points, K, TCO_n)
            boxes_rend = R.boxes_from_uv(uv)
            center_uv = R.project_points_robust(
                jnp.zeros((TCO.shape[0], 1, 3)), K, TCO_n
            )
            boxes_crop = R.deepim_boxes(
                center_uv, boxes_rend, boxes_rend,
                im_size=images.shape[-2:], lamb=cfg.lamb,
            )
            K_crop = R.get_K_crop_resize(
                K, boxes_crop, images.shape[-2:], cfg.render_size
            )
            crops = R.crop_images_to_boxes(
                images, boxes_crop, cfg.render_size, sampling_ratio=4
            )
            return TCO_n, tCR, K_crop, crops

        from functools import partial

        @partial(jax.jit, static_argnames=("im_size",))
        def view_crop_K(K_rep, TCV_O_flat, points_rep, im_size):
            """Crop intrinsics of each virtual view
            (pose_rigid.compute_crops_multiview, :256-330)."""
            uv = R.project_points_robust(points_rep, K_rep, TCV_O_flat)
            boxes_rend = R.boxes_from_uv(uv)
            center_uv = R.project_points_robust(
                jnp.zeros((TCV_O_flat.shape[0], 1, 3)), K_rep, TCV_O_flat
            )
            boxes_crop = R.deepim_boxes(
                center_uv, boxes_rend, boxes_rend,
                im_size=im_size, lamb=cfg.lamb,
            )
            return R.get_K_crop_resize(
                K_rep, boxes_crop, im_size, cfg.render_size
            )

        @jax.jit
        def update_step(refiner_vars, crops, renders, TCO, K_crop, tCR):
            x = jnp.concatenate([crops, renders], axis=1)
            out = self.refiner_net.apply(refiner_vars, x)
            dR = R.rotation_from_ortho6d(out[:, :6])
            return R.pose_update_with_reference_point(
                TCO, K_crop, out[:, 6:9], dR, tCR
            )

        @jax.jit
        def score_step(coarse_vars, crops, renders):
            x = jnp.concatenate([crops, renders], axis=1)
            logits = self.coarse_net.apply(coarse_vars, x)
            return logits[:, 0], jax.nn.sigmoid(logits[:, 0])

        @jax.jit
        def init_step(boxes, points, K, Rm):
            return R.TCO_init_from_boxes_autodepth_with_R(boxes, points, K, Rm)

        object.__setattr__(
            self,
            "_steps_cache",
            (crop_step, view_crop_K, update_step, score_step, init_step),
        )
        return self._steps_cache

    def _points(self, labels: np.ndarray) -> np.ndarray:
        return np.stack([self.meshes.points[int(l)] for l in labels])

    def _render_views(
        self, labels, TCO_n: np.ndarray, K: np.ndarray, K_crop: np.ndarray,
        view_crop_K, points, im_size,
    ) -> np.ndarray:
        """Multi-view renders per hypothesis: (B, V * n_render_channels, H, W)."""
        cfg = self.config
        TCO_np = np.asarray(TCO_n, np.float64)
        tCR = TCO_np[:, :3, 3]
        TCV_O = make_TCO_multiview(
            TCO_np, tCR, cfg.multiview_type, cfg.n_rendered_views
        )  # (B, V, 4, 4)
        B, V = TCV_O.shape[:2]
        assert V == cfg.n_rendered_views, (
            f"multiview_type {cfg.multiview_type!r} yields {V} views but "
            f"n_rendered_views={cfg.n_rendered_views} (the count includes the "
            f"TCO view, like the reference TrainingConfig)"
        )
        if V == 1:
            KV = np.asarray(K_crop, np.float32)[:, None]
        else:
            # per-view deepim crop K against the ORIGINAL camera K, as
            # compute_crops_multiview does (pose_rigid.py:256-330)
            KV = np.array(
                view_crop_K(
                    jnp.repeat(jnp.asarray(K, jnp.float32), V, axis=0),
                    jnp.asarray(TCV_O.reshape(B * V, 4, 4), jnp.float32),
                    jnp.repeat(jnp.asarray(points, jnp.float32), V, axis=0),
                    tuple(im_size),
                )
            ).reshape(B, V, 3, 3)
            # view 0 renders through the real crop camera (pose_rigid.py:570)
            KV[:, 0] = np.asarray(K_crop, np.float32)
        return self.meshes.render_multiview_batch(
            labels, TCV_O.astype(np.float32), KV, cfg.render_size,
            render_normals=cfg.render_normals,
        )

    # --------------------------------------------------------------- public
    def refine_batch(
        self,
        images: np.ndarray,  # (B, 3, H, W) float [0,1] full images
        K: np.ndarray,  # (B, 3, 3)
        labels: np.ndarray,  # (B,)
        TCO_init: np.ndarray,  # (B, 4, 4) meters
        n_iterations: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (refined TCO (B, 4, 4), pose scores (B,))."""
        crop_step, view_crop_K, update_step, score_step, _ = self._device_steps()
        cfg = self.config
        n_it = cfg.n_iterations if n_iterations is None else n_iterations
        points = self._points(labels)
        imgs = jnp.asarray(images, jnp.float32)
        Kd = jnp.asarray(K, jnp.float32)
        pts = jnp.asarray(points, jnp.float32)
        TCO = jnp.asarray(TCO_init, jnp.float32)
        im_size = images.shape[-2:]
        for _ in range(n_it):
            TCO, tCR, K_crop, crops = crop_step(imgs, Kd, TCO, pts)
            renders = self._render_views(
                labels, np.asarray(TCO), K, np.asarray(K_crop), view_crop_K,
                points, im_size,
            )
            TCO = update_step(
                self.refiner_vars, crops, jnp.asarray(renders), TCO, K_crop, tCR
            )
        scores = self.score_batch(images, K, labels, np.asarray(TCO))
        return np.asarray(TCO), scores

    def score_batch(
        self, images: np.ndarray, K: np.ndarray, labels: np.ndarray,
        TCO: np.ndarray,
    ) -> np.ndarray:
        """Coarse-model pose score at TCO, sigmoid(logit) in [0, 1]
        (forward_scoring_model / forward_coarse: exactly one render per
        hypothesis regardless of n_rendered_views, pose_rigid.py:700-712)."""
        crop_step, _, _, score_step, _ = self._device_steps()
        points = self._points(labels)
        imgs = jnp.asarray(images, jnp.float32)
        Kd = jnp.asarray(K, jnp.float32)
        pts = jnp.asarray(points, jnp.float32)
        TCO_n, tCR, K_crop, crops = crop_step(imgs, Kd, jnp.asarray(TCO), pts)
        renders = self.meshes.render_batch(
            labels, np.asarray(TCO_n, np.float64), np.asarray(K_crop),
            self.config.render_size, render_normals=self.config.render_normals,
        )
        _, scores = score_step(self.coarse_vars, crops, jnp.asarray(renders))
        return np.asarray(scores)

    def classify_coarse(
        self,
        images: np.ndarray,  # (B, 3, H, W) full images
        K: np.ndarray,  # (B, 3, 3)
        labels: np.ndarray,  # (B,)
        boxes: np.ndarray,  # (B, 4) detection boxes xyxy
        top_k: int = 1,
        chunk: int = 64,
        grid_size: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """SO(3)-grid coarse hypothesis classification: scores every grid
        rotation per detection (forward_coarse_model). Returns
        (TCO (B, top_k, 4, 4) best hypotheses, scores (B, M) all scores)."""
        _, _, _, score_step, init_step = self._device_steps()
        grid = load_so3_grid(grid_size or self.config.so3_grid_size)  # (M, 3, 3)
        M = grid.shape[0]
        B = len(labels)
        points = self._points(labels)
        all_scores = np.zeros((B, M), np.float32)
        all_TCO = np.zeros((B, M, 4, 4), np.float32)
        for b in range(B):
            img = jnp.asarray(np.repeat(images[b:b + 1], chunk, 0), jnp.float32)
            Kb = jnp.asarray(np.repeat(K[b:b + 1], chunk, 0), jnp.float32)
            pts = jnp.asarray(np.repeat(points[b:b + 1], chunk, 0), jnp.float32)
            box = jnp.asarray(np.repeat(boxes[b:b + 1], chunk, 0), jnp.float32)
            lbl = np.repeat(labels[b:b + 1], chunk, 0)
            for s in range(0, M, chunk):
                e = min(s + chunk, M)
                n = e - s
                Rm = np.tile(np.eye(3, dtype=np.float32), (chunk, 1, 1))
                Rm[:n] = grid[s:e]
                TCO_h = init_step(box, pts, Kb, jnp.asarray(Rm))
                sc = self.score_batch(
                    np.asarray(img), np.asarray(Kb), lbl, np.asarray(TCO_h)
                )
                all_scores[b, s:e] = sc[:n]
                all_TCO[b, s:e] = np.asarray(TCO_h)[:n]
        order = np.argsort(-all_scores, axis=1)[:, :top_k]
        best = np.take_along_axis(all_TCO, order[:, :, None, None], axis=1)
        return best, all_scores
