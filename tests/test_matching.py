"""match_templates vs a literal numpy transcription of the reference semantics
(LocalSimilarity.test, src/models/matching.py:188-316)."""

import jax
import jax.numpy as jnp
import numpy as np

from gigapose_tpu.ops.matching import match_templates, downsample_mask


def _loc(idx, npat):
    return np.stack([idx % npat, idx // npat], axis=-1).astype(np.float64)


def oracle_match(tar_feat, src_feats, tar_mask, src_masks, k, sim_t, patch_t, npat):
    """Loop-based oracle following the published algorithm step by step."""
    B, N, P, C = src_feats.shape
    tar_f = tar_feat / np.linalg.norm(tar_feat, axis=-1, keepdims=True)
    src_f = src_feats / np.linalg.norm(src_feats, axis=-1, keepdims=True)
    sim = np.einsum("btc,bnsc->bnts", tar_f, src_f)
    sim = sim * src_masks[:, :, None, :] * tar_mask[:, None, :, None]
    sim[sim < sim_t] = 0.0

    score_t2s, idx_t2s = sim.max(3), sim.argmax(3)
    score_s2t, idx_s2t = sim.max(2), sim.argmax(2)
    mask_sim = score_t2s >= sim_t

    mask_cycle = np.zeros((B, N, P), bool)
    for b in range(B):
        for n in range(N):
            for t in range(P):
                j = idx_t2s[b, n, t]
                t2 = idx_s2t[b, n, j]
                d = np.linalg.norm(_loc(np.array(t2), npat) - _loc(np.array(t), npat))
                mask_cycle[b, n, t] = (d <= patch_t) and (score_s2t[b, n, j] >= sim_t)

    mask_t2s = np.take_along_axis(src_masks, idx_t2s, axis=2)
    mask_nonzero = (
        (tar_mask[:, None, :] > 0)
        & (mask_t2s > 0)
        & (idx_s2t != 0)
        & (idx_t2s != 0)
    )
    mask_all = mask_sim & mask_cycle & mask_nonzero

    sim_avg = np.where(
        mask_all.sum(2) > 0, (score_t2s * mask_all).sum(2) / (npat * npat), 0.0
    )
    ids = np.argsort(-sim_avg, axis=1, kind="stable")[:, :k]
    scores = np.take_along_axis(sim_avg, ids, axis=1)
    sel_valid = np.take_along_axis(mask_all, ids[:, :, None], axis=1)
    sel_src = _loc(np.take_along_axis(idx_t2s, ids[:, :, None], axis=1), npat)
    sel_src[~sel_valid] = -1
    return ids, scores, sel_valid, sel_src


def _random_inputs(seed, B=3, N=7, npat=4, C=32):
    rng = np.random.default_rng(seed)
    P = npat * npat
    tar = rng.normal(size=(B, P, C))
    src = rng.normal(size=(B, N, P, C))
    # bias some template patches toward query patches so matches exist
    for b in range(B):
        for n in range(N):
            take = rng.integers(0, P, size=P // 2)
            src[b, n, take] = tar[b, take] + 0.1 * rng.normal(size=(len(take), C))
    tmask = (rng.uniform(size=(B, P)) > 0.2).astype(np.float64)
    smask = (rng.uniform(size=(B, N, P)) > 0.2).astype(np.float64)
    return tar, src, tmask, smask


def test_match_templates_vs_oracle():
    npat, k = 4, 3
    tar, src, tmask, smask = _random_inputs(0)
    ids_o, scores_o, valid_o, src_o = oracle_match(
        tar, src, tmask, smask, k, 0.5, 1, npat
    )
    res = jax.jit(
        lambda *a: match_templates(
            *a, k=k, sim_threshold=0.5, patch_threshold=1, num_patches=npat
        )
    )(
        jnp.asarray(tar, jnp.float32),
        jnp.asarray(src, jnp.float32),
        jnp.asarray(tmask, jnp.float32),
        jnp.asarray(smask, jnp.float32),
    )
    np.testing.assert_array_equal(np.asarray(res.ids), ids_o)
    np.testing.assert_allclose(np.asarray(res.scores), scores_o, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(res.valid), valid_o)
    np.testing.assert_allclose(np.asarray(res.src_pts), src_o, atol=1e-6)
    # tar pts are the patch grid where valid, -1 elsewhere
    tar_pts = np.asarray(res.tar_pts)
    grid = _loc(np.arange(npat * npat), npat)
    assert np.all(tar_pts[valid_o] == np.broadcast_to(grid, valid_o.shape + (2,))[valid_o])
    assert np.all(tar_pts[~valid_o] == -1)


def test_match_templates_multiple_seeds():
    npat, k = 4, 2
    for seed in range(1, 5):
        tar, src, tmask, smask = _random_inputs(seed, B=2, N=5)
        ids_o, scores_o, valid_o, _ = oracle_match(
            tar, src, tmask, smask, k, 0.5, 1, npat
        )
        res = match_templates(
            jnp.asarray(tar, jnp.float32),
            jnp.asarray(src, jnp.float32),
            jnp.asarray(tmask, jnp.float32),
            jnp.asarray(smask, jnp.float32),
            k=k,
            sim_threshold=0.5,
            patch_threshold=1,
            num_patches=npat,
        )
        np.testing.assert_array_equal(np.asarray(res.ids), ids_o)
        np.testing.assert_allclose(np.asarray(res.scores), scores_o, atol=1e-5)


def test_downsample_mask_nearest():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    mask = (rng.uniform(size=(2, 224, 224)) > 0.5).astype(np.float32)
    want = (
        F.interpolate(torch.from_numpy(mask).unsqueeze(1), size=(16, 16))
        .squeeze(1)
        .reshape(2, -1)
        .numpy()
    )
    got = downsample_mask(jnp.asarray(mask), 16)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_match_templates_src2tar_direction():
    """search_direction=src2tar swaps the primary argmax axis like the
    reference's switch (matching.py:241-246): equal to running the default
    direction on the transposed similarity problem."""
    npat, k = 4, 2
    tar, src, tmask, smask = _random_inputs(7, B=2, N=4)
    got = match_templates(
        jnp.asarray(tar, jnp.float32), jnp.asarray(src, jnp.float32),
        jnp.asarray(tmask, jnp.float32), jnp.asarray(smask, jnp.float32),
        k=k, sim_threshold=0.5, patch_threshold=1, num_patches=npat,
        search_direction="src2tar",
    )
    # oracle: swap score/idx axes in the numpy transcription
    B, N, P, C = src.shape
    tar_f = tar / np.linalg.norm(tar, axis=-1, keepdims=True)
    src_f = src / np.linalg.norm(src, axis=-1, keepdims=True)
    sim = np.einsum("btc,bnsc->bnts", tar_f, src_f)
    sim = sim * smask[:, :, None, :] * tmask[:, None, :, None]
    sim[sim < 0.5] = 0.0
    score_t2s, idx_t2s = sim.max(2), sim.argmax(2)
    score_s2t, idx_s2t = sim.max(3), sim.argmax(3)
    mask_sim = score_t2s >= 0.5
    mask_cycle = np.zeros_like(mask_sim, bool)
    for b in range(B):
        for n in range(N):
            for t in range(P):
                j = idx_t2s[b, n, t]
                t2 = idx_s2t[b, n, j]
                d = np.linalg.norm(_loc(np.array(t2), npat) - _loc(np.array(t), npat))
                mask_cycle[b, n, t] = (d <= 1) and (score_s2t[b, n, j] >= 0.5)
    mask_t2s = np.take_along_axis(smask, idx_t2s, axis=2)
    mask_all = (
        mask_sim & mask_cycle & (tmask[:, None, :] > 0) & (mask_t2s > 0)
        & (idx_s2t != 0) & (idx_t2s != 0)
    )
    sim_avg = np.where(
        mask_all.sum(2) > 0, (score_t2s * mask_all).sum(2) / (npat * npat), 0.0
    )
    ids_o = np.argsort(-sim_avg, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.asarray(got.ids), ids_o)
