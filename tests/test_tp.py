"""Tensor parallelism (parallel/tp.py) on an 8-virtual-device CPU mesh.

Checks the scaling-book contract: Megatron param specs + the single qkv
heads annotation produce the SAME features as the single-device forward,
with weights actually sharded over "mp". (The reference has no TP — its
scaling story is DDP only, src/megapose/utils/distributed.py — this is a
TPU-native capability on top of parity.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigapose_tpu.models.ae_net import AENet
from gigapose_tpu.parallel.tp import (
    make_dp_mp_mesh,
    shard_params_tp,
    vit_tp_param_specs,
)
from jax.sharding import NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _setup(model="vit_tiny_test"):
    ae = AENet(model_name=model)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 3, 224, 224)), jnp.float32
    )
    params = ae.init(jax.random.PRNGKey(0), x[:1])
    ref = jax.jit(ae.apply)(params, x)
    return x, params, np.asarray(ref)


@pytest.mark.parametrize(
    "dp,mp,model",
    [
        (1, 8, "vit_tiny_test"),
        (2, 4, "vit_tiny_test"),
        (4, 2, "vit_tiny_test"),
        (2, 4, "vit_tiny_swiglu_test"),  # ViT-G FFN path (w12/w3)
    ],
)
def test_tp_forward_matches_single_device(dp, mp, model):
    x, params, ref = _setup(model)
    mesh = make_dp_mp_mesh(dp, mp)
    ae_tp = AENet(model_name=model, tp_mesh=mesh)
    p_sharded = shard_params_tp(params, mesh)
    x_sharded = jax.device_put(
        x, NamedSharding(mesh, P("dp" if dp > 1 else None))
    )
    out = jax.jit(ae_tp.apply)(p_sharded, x_sharded)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_params_actually_sharded():
    x, params, _ = _setup()
    mesh = make_dp_mp_mesh(1, 8)
    p_sharded = shard_params_tp(params, mesh)
    blk = p_sharded["params"]["vit"]["block0"]
    # column-parallel: fc1/qkv kernels split their output dim over 8 devices
    for m, k, axis in (("mlp", "fc1", 1), ("attn", "qkv", 1)):
        kern = blk[m][k]["kernel"]
        shard_shape = kern.sharding.shard_shape(kern.shape)
        assert shard_shape[axis] == kern.shape[axis] // 8
    # row-parallel: fc2/proj kernels split their input dim
    for m, k in (("mlp", "fc2"), ("attn", "proj")):
        kern = blk[m][k]["kernel"]
        assert kern.sharding.shard_shape(kern.shape)[0] == kern.shape[0] // 8
    # everything else replicated
    ln = blk["norm1"]["scale"]
    assert ln.sharding.shard_shape(ln.shape) == ln.shape


def test_specs_cover_swiglu():
    specs = vit_tp_param_specs(
        {"params": {"vit": {"block0": {"mlp": {
            "w12": {"kernel": np.zeros((4, 8)), "bias": np.zeros(8)},
            "w3": {"kernel": np.zeros((8, 4)), "bias": np.zeros(4)},
        }}}}}
    )
    mlp = specs["params"]["vit"]["block0"]["mlp"]
    assert mlp["w12"]["kernel"] == P(None, "mp")
    assert mlp["w12"]["bias"] == P("mp")
    assert mlp["w3"]["kernel"] == P("mp", None)
    assert mlp["w3"]["bias"] == P()
