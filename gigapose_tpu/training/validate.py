"""Validation metrics.

The reference's de-facto regression metric is `val/matching`: mean pixel
distance between GT and predicted patch correspondences on validation pairs
(src/models/gigaPose.py:316-341 via LocalSimilarity.val). Rebuilt here over
the fixed-shape match_pair op; also reports the regression errors the
reference logs during validation_step (scale_err, angle_err)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from gigapose_tpu.lib3d.geometry import cos_sin
from gigapose_tpu.models.ae_net import AENet
from gigapose_tpu.models.ist_net import ISTNet
from gigapose_tpu.ops.matching import match_pair
from gigapose_tpu.training.state import TrainBatch


def validation_metrics(
    ae_net: AENet,
    ist_net: ISTNet,
    ae_params,
    ist_vars,
    batch: TrainBatch,
    sim_threshold: float = 0.5,
    patch_threshold: int = 3,
    num_patches: int = 16,
) -> Dict[str, jnp.ndarray]:
    src_feat = ae_net.apply(ae_params, batch.src_img)
    tar_feat = ae_net.apply(ae_params, batch.tar_img)
    pred_src, pred_tar, pred_valid, _ = match_pair(
        src_feat,
        tar_feat,
        batch.src_mask,
        batch.tar_mask,
        sim_threshold=sim_threshold,
        patch_threshold=patch_threshold,
        num_patches=num_patches,
    )
    # val/matching: distance between GT tar pts and predicted tar pts at
    # patches where both are valid (gigaPose.py:329-341). pred_tar is the
    # query grid; compare the *source-side* match locations instead, aligned
    # at the same query patch index: GT src_pts vs predicted src location.
    gt_valid = batch.src_pts[..., 0] >= 0
    both = gt_valid & pred_valid
    d = jnp.linalg.norm(batch.src_pts - pred_src, axis=-1)
    matching = jnp.sum(d * both) / jnp.maximum(jnp.sum(both), 1)

    # regression errors (gigaPose.py:247-253)
    ist_out = ist_net.apply(
        ist_vars, batch.src_img, batch.tar_img, batch.src_pts, batch.tar_pts
    )
    v = ist_out.valid & gt_valid
    B, P = v.shape
    gt_scale = jnp.broadcast_to(batch.rel_scale[:, None], (B, P))
    gt_cs = jnp.broadcast_to(cos_sin(batch.rel_inplane)[:, None], (B, P, 2))
    scale_err = jnp.sum(jnp.abs(ist_out.scale - gt_scale) * v) / jnp.maximum(v.sum(), 1)
    cos_diff = jnp.clip(jnp.sum(ist_out.cossin * gt_cs, -1), -1, 1)
    angle_err = jnp.rad2deg(
        jnp.sum(jnp.arccos(cos_diff) * v) / jnp.maximum(v.sum(), 1)
    )
    return {
        "val/matching": matching,
        "val/scale_err": scale_err,
        "val/angle_err": angle_err,
        "val/num_matches": jnp.sum(pred_valid) / pred_valid.shape[0],
    }
