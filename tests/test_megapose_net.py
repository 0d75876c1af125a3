"""Megapose WideResNet flax twin: numerical equality with the reference's own
torch module after state-dict conversion (proves the released refiner/coarse
checkpoints will load 1:1)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
def test_wideresnet_matches_reference_torch():
    import importlib.util
    import torch

    # load the reference torch module in isolation (it only needs torch)
    spec = importlib.util.spec_from_file_location(
        "ref_wide_resnet", os.path.join(REF, "src/megapose/models/wide_resnet.py")
    )
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    torch.manual_seed(0)
    n_inputs = 6
    model_t = ref_mod.WideResNet18(n_inputs=n_inputs, width=0.25).eval()
    # randomize batchnorm stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in model_t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    x = np.random.default_rng(1).normal(size=(2, n_inputs, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = model_t(torch.from_numpy(x)).numpy()  # (B, C, h, w) feature map

    import jax.numpy as jnp

    from gigapose_tpu.refiner.megapose_net import (
        CONFIG,
        MegaposeWideResNet,
        megapose_backbone_to_flax,
    )

    sd = {f"backbone.{k}": v for k, v in model_t.state_dict().items()}
    params, stats = megapose_backbone_to_flax(sd, CONFIG[18])
    net = MegaposeWideResNet(layers=CONFIG[18], width=0.25, pool=False)
    got = net.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
def test_pose_head_net_shapes():
    import jax
    import jax.numpy as jnp

    from gigapose_tpu.refiner.megapose_net import CONFIG, MegaposePoseHeadNet

    net = MegaposePoseHeadNet(layers=CONFIG[18], width=0.25)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 64, 64)))
    out = net.apply(v, jnp.zeros((2, 9, 64, 64)))
    assert out.shape == (2, 9)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
def test_vanilla_resnet34_matches_torchvision():
    """Against the reference's vendored torchvision resnet34 (the
    'vanilla_resnet34' backbone option) — torchvision itself is not in this
    image, and the vendored module only needs torch."""
    import importlib.util
    import torch

    import jax.numpy as jnp

    from gigapose_tpu.refiner.megapose_net import VanillaResNet34, vanilla_resnet34_to_flax

    spec = importlib.util.spec_from_file_location(
        "ref_tv_resnet", os.path.join(REF, "src/megapose/models/torchvision_resnet.py")
    )
    tvm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tvm)

    torch.manual_seed(0)
    model_t = tvm.resnet34(num_classes=512, n_input_channels=3).eval()
    with torch.no_grad():
        for m in model_t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    x = np.random.default_rng(2).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = model_t(torch.from_numpy(x)).numpy()

    params, stats = vanilla_resnet34_to_flax(model_t.state_dict())
    net = VanillaResNet34()
    got = net.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)
