"""gigapose .ckpt converter: a synthetic torch checkpoint with the reference's
exact key layout must convert into trees that match our model inits leaf-for-
leaf (shape and dtype)."""

import numpy as np
import pytest


def _dinov2_hub_sd(depth=2, C=64, heads=2, P=16 * 16 + 1, prefix=""):
    rng = np.random.default_rng(0)
    f = lambda *s: rng.normal(size=s).astype(np.float32)
    sd = {
        f"{prefix}cls_token": f(1, 1, C),
        f"{prefix}pos_embed": f(1, P, C),
        f"{prefix}patch_embed.proj.weight": f(C, 3, 14, 14),
        f"{prefix}patch_embed.proj.bias": f(C),
        f"{prefix}norm.weight": f(C),
        f"{prefix}norm.bias": f(C),
    }
    for i in range(depth):
        b = f"{prefix}blocks.{i}."
        sd.update(
            {
                b + "norm1.weight": f(C), b + "norm1.bias": f(C),
                b + "attn.qkv.weight": f(3 * C, C), b + "attn.qkv.bias": f(3 * C),
                b + "attn.proj.weight": f(C, C), b + "attn.proj.bias": f(C),
                b + "ls1.gamma": f(C),
                b + "norm2.weight": f(C), b + "norm2.bias": f(C),
                b + "mlp.fc1.weight": f(4 * C, C), b + "mlp.fc1.bias": f(4 * C),
                b + "mlp.fc2.weight": f(C, 4 * C), b + "mlp.fc2.bias": f(C),
                b + "ls2.gamma": f(C),
            }
        )
    return sd


def _ist_sd(prefix="ist_net."):
    rng = np.random.default_rng(1)
    f = lambda *s: rng.normal(size=s).astype(np.float32)
    sd = {f"{prefix}backbone.conv1.weight": f(128, 3, 7, 7)}
    dims = [128, 192, 256, 512]
    in_dims = [128] + dims[:-1]

    def bn(name, c):
        sd[f"{name}.weight"] = f(c)
        sd[f"{name}.bias"] = f(c)
        sd[f"{name}.running_mean"] = f(c)
        sd[f"{name}.running_var"] = np.abs(f(c))

    bn(f"{prefix}backbone.bn1", 128)
    for li, (din, d) in enumerate(zip(in_dims, dims), start=1):
        for bi in range(2):
            base = f"{prefix}backbone.layer{li}.{bi}"
            cin = din if bi == 0 else d
            sd[f"{base}.conv1.weight"] = f(d, cin, 3, 3)
            sd[f"{base}.conv2.weight"] = f(d, d, 3, 3)
            bn(f"{base}.bn1", d)
            bn(f"{base}.bn2", d)
            if bi == 0 and li > 1:  # stride-2 blocks have a downsample
                sd[f"{base}.downsample.0.weight"] = f(d, din, 1, 1)
                bn(f"{base}.downsample.1", d)
    sd[f"{prefix}backbone.layer4_outconv.weight"] = f(256, 512, 1, 1)
    for head in ("scale_predictor", "inplane_predictor"):
        out = 1 if head == "scale_predictor" else 2
        sd[f"{prefix}regressor.{head}.0.weight"] = f(512, 512)
        sd[f"{prefix}regressor.{head}.0.bias"] = f(512)
        sd[f"{prefix}regressor.{head}.2.weight"] = f(256, 512)
        sd[f"{prefix}regressor.{head}.2.bias"] = f(256)
        sd[f"{prefix}regressor.{head}.4.weight"] = f(out, 256)
        sd[f"{prefix}regressor.{head}.4.bias"] = f(out)
    return sd


def test_full_ckpt_conversion_matches_model_trees(tmp_path):
    import torch
    import jax
    import jax.numpy as jnp

    from gigapose_tpu.models.convert import gigapose_ckpt_to_flax
    from gigapose_tpu.models.ist_net import default_ist_net
    from gigapose_tpu.models.vit import ViT, ViTConfig

    depth, C = 2, 64
    sd = {**_dinov2_hub_sd(depth, C, prefix="ae_net.dinov2_model."), **_ist_sd()}
    path = str(tmp_path / "fixture.ckpt")
    torch.save({"state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}}, path)

    converted = gigapose_ckpt_to_flax(path, depth)

    # ViT tree: identical structure + shapes to a fresh init of the same config
    vit = ViT(ViTConfig(embed_dim=C, depth=depth, num_heads=2))
    ref = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 224, 224)))["params"]
    got = converted["ae"]["vit"]
    ref_paths = {tuple(str(p) for p in path_): leaf.shape
                 for path_, leaf in jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {tuple(str(p) for p in path_): leaf.shape
                 for path_, leaf in jax.tree_util.tree_flatten_with_path(got)[0]}
    assert ref_paths == got_paths

    # IST tree: matches default_ist_net init (params + batch_stats)
    ist = default_ist_net()
    ist_ref = ist.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 3, 224, 224)), jnp.zeros((1, 3, 224, 224)),
        jnp.zeros((1, 4, 2)), jnp.zeros((1, 4, 2)),
    )
    got_params, got_stats = converted["ist"]
    for name, ref_tree, got_tree in [
        ("params", ist_ref["params"], got_params),
        ("batch_stats", ist_ref["batch_stats"], got_stats),
    ]:
        rp = {tuple(str(p) for p in path_): leaf.shape
              for path_, leaf in jax.tree_util.tree_flatten_with_path(ref_tree)[0]}
        gp = {tuple(str(p) for p in path_): leaf.shape
              for path_, leaf in jax.tree_util.tree_flatten_with_path(got_tree)[0]}
        assert rp == gp, f"{name} trees differ"

    # numeric spot checks through the layout conversions
    np.testing.assert_allclose(
        got["block0"]["attn"]["qkv"]["kernel"],
        sd["ae_net.dinov2_model.blocks.0.attn.qkv.weight"].T,
    )
    np.testing.assert_allclose(
        got_params["backbone"]["conv1"]["kernel"],
        sd["ist_net.backbone.conv1.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        got_stats["backbone"]["bn1"]["var"],
        sd["ist_net.backbone.bn1.running_var"],
    )
