"""render_templates CLI -> reference template layout -> onboarding plumbing
(the BOP'24 on-the-fly onboarding path, BASELINE config 4)."""

import os

import numpy as np
import pytest

from tests.test_rasterizer import _write_cube_ply


def test_render_cli_and_onboard(tmp_path):
    cad = tmp_path / "models"
    cad.mkdir()
    _write_cube_ply(str(cad / "obj_000001.ply"), size=50, colors=False)
    out = str(tmp_path / "templates")

    from gigapose_tpu.scripts.render_templates import main

    main([f"cad_dir={cad}", f"out_dir={out}", "level=0"])

    # layout consumable by the disk loader
    from gigapose_tpu.dataloader.templates_disk import list_objects, load_object_templates

    assert list_objects(out) == [1]
    data = load_object_templates(out, 1, use_cache=False)
    assert data["rgba"].shape[0] == 42 and data["poses"].shape == (42, 4, 4)
    # poses at 400 mm radius
    np.testing.assert_allclose(
        np.linalg.norm(data["poses"][:, :3, 3], axis=1), 400.0, rtol=1e-3
    )

    # onboarding produces a consistent store with tiny nets
    import jax
    import jax.numpy as jnp

    from gigapose_tpu.models.ae_net import AENet
    from gigapose_tpu.models.ist_net import ISTBackbone, ISTNet, Regressor
    from gigapose_tpu.pipeline.templates import onboard_templates

    ae = AENet(model_name="vit_tiny_test")
    ist = ISTBackbone(initial_dim=8, block_dims=(8, 8, 12, 16), descriptor_size=16,
                      input_size=64)
    ae_params = ae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 224, 224)))
    ist_vars = ist.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 224, 224)), False)
    store = onboard_templates(
        jax.jit(lambda x: ae.apply(ae_params, x)),
        jax.jit(lambda x: ist.apply(ist_vars, x, False)),
        [data["rgba"]],
        [data["poses"]],
        chunk=16,
    )
    assert store.ae_features.shape[:3] == (1, 42, 256)
    assert np.isfinite(np.asarray(store.ae_features)).all()
    assert np.asarray(store.masks).sum() > 0


def test_onboard_store_disk_cache(tmp_path):
    """CoarseRunner.onboard(cache_tag=...) persists and reloads the store."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tests import synthetic_bop
    from gigapose_tpu.pipeline.runner import CoarseRunner
    import test as test_cli
    from gigapose_tpu.utils.config import load_config

    root = synthetic_bop.build(str(tmp_path))
    cfg = load_config("test", ["test_dataset_name=tudl"])
    import os

    os.environ["GIGAPOSE_TINY"] = "1"
    est = test_cli.build_estimator(cfg, tiny=True)
    tdir = os.path.join(root, "datasets", "templates", "tudl")
    kwargs = dict(template_dir=tdir, save_dir=str(tmp_path / "r"),
                  dataset_name="tudl", num_templates=8, cache_tag="tiny")
    r1 = CoarseRunner.onboard(est, **kwargs)
    assert os.path.exists(os.path.join(tdir, "onboarded_tiny.npz"))
    r2 = CoarseRunner.onboard(est, **kwargs)  # loads from cache
    np.testing.assert_allclose(
        np.asarray(r1.store.ae_features), np.asarray(r2.store.ae_features),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(r1.store.poses), np.asarray(r2.store.poses)
    )
