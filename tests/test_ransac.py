"""ransac_affine vs a literal numpy transcription of the reference RANSAC
(src/models/ransac.py:37-106 forward_, :108-172 batch loop)."""

import jax
import jax.numpy as jnp
import numpy as np

from gigapose_tpu.ops.ransac import ransac_affine


def oracle_ransac_single(src, tar, score, rel_scale, rel_cossin, thresh, patch):
    """Compacted single-sample oracle (valid rows only), leave-one-out."""
    n = len(src)
    src = src * patch
    tar = tar * patch
    c, s = rel_cossin[:, 0], rel_cossin[:, 1]
    Ms = np.zeros((n, 3, 3))
    Ms[:, 2, 2] = 1
    Ms[:, 0, 0], Ms[:, 0, 1] = rel_scale * c, rel_scale * -s
    Ms[:, 1, 0], Ms[:, 1, 1] = rel_scale * s, rel_scale * c
    proj = np.einsum("nij,nj->ni", Ms[:, :2, :2], src)
    Ms[:, :2, 2] = tar - proj
    scores = np.zeros(n)
    inlier_sets = []
    for i in range(n):
        others = [j for j in range(n) if j != i]
        p = np.einsum("ij,nj->ni", Ms[i, :2, :2], src[others]) + Ms[i, :2, 2]
        err = np.linalg.norm(tar[others] - p, axis=1)
        inl = err <= thresh
        scores[i] = np.sum(inl * score[others])
        inlier_sets.append([others[j] for j in range(len(others)) if inl[j]])
    best = int(np.argmax(scores))
    return Ms[best], scores[best] == 0, inlier_sets[best], scores[best]


def _random_case(seed, B=6, N=12, frac_valid=0.7):
    rng = np.random.default_rng(seed)
    src = rng.uniform(0, 16, size=(B, N, 2))
    tar = rng.uniform(0, 16, size=(B, N, 2))
    score = rng.uniform(0.5, 1.0, size=(B, N))
    rel_scale = rng.uniform(0.5, 2.0, size=(B, N))
    ang = rng.uniform(0, 2 * np.pi, size=(B, N))
    cossin = np.stack([np.cos(ang), np.sin(ang)], axis=-1)
    valid = rng.uniform(size=(B, N)) < frac_valid
    valid[0] = False  # one all-invalid row exercises the identity path
    # plant a consistent affine on half the points of sample 1 so inliers exist
    theta, sc = 0.4, 1.3
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    t = np.array([2.0, -1.0])
    planted = np.arange(0, N, 2)
    tar[1, planted] = (sc * R @ (src[1, planted] * 14).T).T / 14 + t / 14
    rel_scale[1, planted] = sc
    cossin[1, planted] = [np.cos(theta), np.sin(theta)]
    valid[1, planted] = True
    return src, tar, score, rel_scale, cossin, valid


def test_ransac_vs_oracle():
    src, tar, score, rel_scale, cossin, valid = _random_case(0)
    res = jax.jit(lambda *a: ransac_affine(*a, pixel_threshold=14.0, patch_size=14))(
        jnp.asarray(src, jnp.float32),
        jnp.asarray(tar, jnp.float32),
        jnp.asarray(score, jnp.float32),
        jnp.asarray(rel_scale, jnp.float32),
        jnp.asarray(cossin, jnp.float32),
        jnp.asarray(valid),
    )
    B, N = src.shape[:2]
    for b in range(B):
        sel = np.where(valid[b])[0]
        if len(sel) == 0:
            np.testing.assert_allclose(np.asarray(res.M[b]), np.eye(3), atol=1e-6)
            assert not bool(res.failed[b])
            assert not np.asarray(res.inliers[b]).any()
            continue
        M_o, failed_o, inliers_o, score_o = oracle_ransac_single(
            src[b, sel], tar[b, sel], score[b, sel],
            rel_scale[b, sel], cossin[b, sel], 14.0, 14
        )
        np.testing.assert_allclose(np.asarray(res.M[b]), M_o, atol=1e-3)
        assert bool(res.failed[b]) == bool(failed_o)
        got_inliers = set(np.where(np.asarray(res.inliers[b]))[0].tolist())
        want_inliers = set(sel[inliers_o].tolist())
        assert got_inliers == want_inliers
        np.testing.assert_allclose(
            float(np.asarray(res.inlier_scores[b]).sum()), score_o, atol=1e-4
        )


def test_ransac_recovers_planted_affine():
    src, tar, score, rel_scale, cossin, valid = _random_case(1)
    res = ransac_affine(
        jnp.asarray(src, jnp.float32), jnp.asarray(tar, jnp.float32),
        jnp.asarray(score, jnp.float32), jnp.asarray(rel_scale, jnp.float32),
        jnp.asarray(cossin, jnp.float32), jnp.asarray(valid),
        pixel_threshold=14.0, patch_size=14,
    )
    theta, sc = 0.4, 1.3
    R = sc * np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    np.testing.assert_allclose(np.asarray(res.M[1, :2, :2]), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.M[1, :2, 2]), [2.0, -1.0], atol=1e-3)
    assert not bool(res.failed[1])


def test_ransac_vmap_over_k():
    """The per-hypothesis loop of the reference (poses.py:124-163) is a vmap here."""
    src, tar, score, rel_scale, cossin, valid = _random_case(2)
    stack = lambda a: jnp.stack([jnp.asarray(a, jnp.float32)] * 5, axis=1)
    res = jax.vmap(
        lambda *a: ransac_affine(*a, pixel_threshold=14.0, patch_size=14),
        in_axes=1, out_axes=1,
    )(stack(src), stack(tar), stack(score), stack(rel_scale), stack(cossin),
      jnp.stack([jnp.asarray(valid)] * 5, axis=1))
    assert res.M.shape == (6, 5, 3, 3)
    # all k copies identical inputs -> identical outputs
    np.testing.assert_allclose(np.asarray(res.M[:, 0]), np.asarray(res.M[:, 4]))
