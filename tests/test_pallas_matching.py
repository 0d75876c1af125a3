"""Fused Pallas matching kernel == the XLA reference implementation
(interpret mode on CPU; the same kernel compiles for TPU via Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np

from gigapose_tpu.ops.matching import match_templates
from gigapose_tpu.ops.pallas_matching import pallas_match_templates


def _world(seed, B=3, O=2, V=6, npat=4, C=32):
    rng = np.random.default_rng(seed)
    P = npat * npat
    tar = rng.normal(size=(B, P, C)).astype(np.float32)
    store = rng.normal(size=(O, V, P, C)).astype(np.float32)
    labels = rng.integers(0, O, size=B).astype(np.int32)
    # plant strong matches for template (label[b], v=b % V)
    for b in range(B):
        take = rng.integers(0, P, size=P // 2)
        store[labels[b], b % V, take] = tar[b, take] + 0.05 * rng.normal(
            size=(len(take), C)
        )
    tar /= np.linalg.norm(tar, axis=-1, keepdims=True)
    store /= np.linalg.norm(store, axis=-1, keepdims=True)
    tmask = (rng.uniform(size=(B, P)) > 0.2).astype(np.float32)
    smask = (rng.uniform(size=(O, V, P)) > 0.2).astype(np.float32)
    return tar, store, tmask, smask, labels


import pytest


@pytest.mark.parametrize(
    "views_per_step,dets_per_step",
    [(None, None), (1, 1), (2, 1), (3, 3), (2, 3), (6, 1)],
)
def test_pallas_matches_xla_reference(views_per_step, dets_per_step):
    npat, k = 4, 3
    for seed in range(3):
        tar, store, tmask, smask, labels = _world(seed)
        got = pallas_match_templates(
            jnp.asarray(tar), jnp.asarray(store), jnp.asarray(tmask),
            jnp.asarray(smask), jnp.asarray(labels),
            k=k, sim_threshold=0.5, patch_threshold=1, num_patches=npat,
            interpret=True, views_per_step=views_per_step,
            dets_per_step=dets_per_step,
        )
        want = match_templates(
            jnp.asarray(tar),
            jnp.asarray(store)[labels],
            jnp.asarray(tmask),
            jnp.asarray(smask)[labels],
            k=k, sim_threshold=0.5, patch_threshold=1, num_patches=npat,
        )
        np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(want.ids))
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(want.scores), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(got.valid), np.asarray(want.valid)
        )
        np.testing.assert_allclose(
            np.asarray(got.src_pts), np.asarray(want.src_pts), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(got.score_pts), np.asarray(want.score_pts), atol=1e-5
        )


def test_pallas_fractional_masks_and_no_cycle():
    """The kernel elides the reference's mask-membership gathers (valid for
    any masks >= 0 when sim_threshold > 0, incl. fractional interpolated
    alpha masks) and handles patch_threshold=0 (cycle check disabled)."""
    npat, k = 4, 3
    tar, store, tmask, smask, labels = _world(11)
    rng = np.random.default_rng(5)
    tmask = (tmask * rng.uniform(0.2, 1.0, tmask.shape)).astype(np.float32)
    smask = (smask * rng.uniform(0.2, 1.0, smask.shape)).astype(np.float32)
    for patch_threshold in (0, 1):
        got = pallas_match_templates(
            jnp.asarray(tar), jnp.asarray(store), jnp.asarray(tmask),
            jnp.asarray(smask), jnp.asarray(labels),
            k=k, sim_threshold=0.4, patch_threshold=patch_threshold,
            num_patches=npat, interpret=True,
        )
        want = match_templates(
            jnp.asarray(tar), jnp.asarray(store)[labels], jnp.asarray(tmask),
            jnp.asarray(smask)[labels],
            k=k, sim_threshold=0.4, patch_threshold=patch_threshold,
            num_patches=npat,
        )
        np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(want.ids))
        np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(want.scores), atol=1e-5
        )
