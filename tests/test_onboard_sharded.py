"""Object-parallel onboarding over a dp mesh == the sequential path.

`onboard_templates_sharded` vmaps the fused per-object onboarding program
over an object axis sharded on "dp" (each virtual device onboards its
objects, the store is all-gathered out) — the multi-chip equivalent of
the reference's num_gpus round-robin template rendering
(src/scripts/render_bop_templates.py:63)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigapose_tpu.models.ae_net import AENet
from gigapose_tpu.parallel.mesh import make_mesh
from gigapose_tpu.pipeline.templates import (
    onboard_templates,
    onboard_templates_sharded,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def test_sharded_onboarding_matches_sequential():
    ae = AENet(model_name="vit_tiny_test")
    params = ae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 56, 56)))
    apply = jax.jit(lambda x: ae.apply(params, x))

    O, V, H = 3, 6, 64
    rng = np.random.default_rng(0)
    rgbas = rng.uniform(size=(O, V, 4, H, H)).astype(np.float32)
    rgbas[:, :, 3] = (rgbas[:, :, 3] > 0.3).astype(np.float32)
    rgbas[:, :, 3, H // 2, H // 2] = 1.0  # non-empty alpha everywhere
    poses = np.tile(np.eye(4, dtype=np.float32), (O, V, 1, 1))

    kw = dict(target_size=56, num_patches=4, chunk=4)
    seq = onboard_templates(apply, apply, list(rgbas), list(poses), **kw)
    mesh = make_mesh(8)
    shd = onboard_templates_sharded(
        apply, apply, rgbas, poses, mesh, **kw
    )

    assert shd.ae_features.shape == seq.ae_features.shape
    np.testing.assert_allclose(
        np.asarray(shd.ae_features), np.asarray(seq.ae_features),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(shd.ist_features), np.asarray(seq.ist_features),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(shd.masks), np.asarray(seq.masks))
    np.testing.assert_allclose(
        np.asarray(shd.Ms), np.asarray(seq.Ms), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(shd.poses), np.asarray(seq.poses))
