"""Int8 (W8A8) serving forward for the DINOv2 ViT backbone.

A functional twin of models/vit.ViT.__call__ that runs every Dense matmul
through the fused Pallas W8A8 kernels (ops/qmm.py): LN+quant+qkv in one
kernel, plain quantized proj, and the whole MLP (LN -> fc1 -> GELU -> fc2)
in one kernel with the (T, 4C) hidden activation resident in VMEM. Attention
einsums and the residual stream stay f32/bf16 exactly like the flax path —
at 257 tokens they are a small slice of the time and int8 buys nothing
there.

Weights are pre-quantized ONCE host-side from the flax param tree
(prepare_int8_params), so the forward consumes int8 weight tensors +
per-output-channel scales; activations use dynamic per-token scales computed
inside the kernels. This is inference-only: training and checkpoint
conversion always run the f32/bf16 flax module, and the int8 tree is derived
from it at load time.

backend="ref" runs the numerically-identical fake-quant math in plain XLA
(CPU tests / non-TPU fallback); backend="interpret" runs the Pallas kernels
in interpreter mode (kernel-equality tests without a TPU).

Reference counterpart: the torch-hub DINOv2 forward the reference runs in
fp32/fp16 (src/models/network/ae_net.py:10-65) — this is a serving-precision
option the reference does not have.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gigapose_tpu.models.vit import ViTConfig
from gigapose_tpu.ops import qmm as Q


def prepare_int8_params(variables: dict, cfg: ViTConfig) -> dict:
    """Flax ViT/AENet variables -> int8 serving param tree (host-side numpy).

    Accepts {"params": {...}} from ViT.init, or the AENet tree with the
    backbone nested under "vit"."""
    if cfg.ffn_layer != "mlp":
        raise NotImplementedError("int8 serving path supports the GELU-MLP "
                                  "configs (vits/b/l); vitg uses SwiGLU")
    p = variables.get("params", variables)
    if "vit" in p:
        p = p["vit"]

    def f32(a):
        return jnp.asarray(a, jnp.float32)

    def row(a):  # (C,) -> (1, C)
        return f32(a).reshape(1, -1)

    def dense(d):
        wq, ws = Q.quantize_weight(f32(d["kernel"]))
        return wq, ws, row(d["bias"])

    out = {
        "embed_kernel": f32(p["patch_embed"]["kernel"]).reshape(-1, cfg.embed_dim),
        "embed_bias": row(p["patch_embed"]["bias"]),
        "cls": f32(p["cls_token"]),
        "pos": f32(p["pos_embed"]),
        "norm_g": row(p["norm"]["scale"]),
        "norm_b": row(p["norm"]["bias"]),
        "blocks": [],
    }
    if cfg.num_register_tokens:
        out["reg"] = f32(p["register_tokens"])
    i = 0
    while f"block{i}" in p:
        b = p[f"block{i}"]
        qkv = dense(b["attn"]["qkv"])
        proj = dense(b["attn"]["proj"])
        fc1 = dense(b["mlp"]["fc1"])
        fc2 = dense(b["mlp"]["fc2"])
        out["blocks"].append({
            "n1g": row(b["norm1"]["scale"]), "n1b": row(b["norm1"]["bias"]),
            "qkv_wq": qkv[0], "qkv_ws": qkv[1], "qkv_b": qkv[2],
            "proj_wq": proj[0], "proj_ws": proj[1], "proj_b": proj[2],
            "ls1": row(b["ls1"]["gamma"]),
            "n2g": row(b["norm2"]["scale"]), "n2b": row(b["norm2"]["bias"]),
            "fc1_wq": fc1[0], "fc1_ws": fc1[1], "fc1_b": fc1[2],
            "fc2_wq": fc2[0], "fc2_ws": fc2[1], "fc2_b": fc2[2],
            "ls2": row(b["ls2"]["gamma"]),
        })
        i += 1
    return out


def _padded_tokens(B: int, N: int) -> int:
    """Smallest Np >= N with Np % 8 == 0 and (B * Np) % 128 == 0, so the
    whole residual stream is padded ONCE and every kernel sees an aligned
    token count — no per-call pad/slice copies."""
    Np = (N + 7) // 8 * 8
    while (B * Np) % 128:
        Np += 8
    return Np


def vit_forward_int8(
    qp: dict,
    images: jnp.ndarray,
    cfg: ViTConfig,
    pos_embed_size: int = 16,
    backend: str = "pallas",   # "pallas" | "interpret" | "ref"
) -> dict:
    """(B, 3, H, W) -> {"x_prenorm", "x_norm"} — layouts identical to
    vit.ViT.__call__ (CLS first, registers dropped)."""
    B, _, H, W = images.shape
    ps = cfg.patch_size
    gh, gw = H // ps, W // ps
    C = cfg.embed_dim

    # patch embed as one matmul: stride==kernel conv IS patch extraction
    x = jnp.transpose(images, (0, 2, 3, 1))                      # NHWC
    x = x.reshape(B, gh, ps, gw, ps, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, gh * gw, ps * ps * 3)
    x = x @ qp["embed_kernel"] + qp["embed_bias"]

    pos_cls, pos_patch = qp["pos"][:, :1], qp["pos"][:, 1:]
    if (gh, gw) != (pos_embed_size, pos_embed_size):
        p = pos_patch.reshape(1, pos_embed_size, pos_embed_size, -1)
        p = jax.image.resize(p, (1, gh, gw, C), method="bicubic")
        pos_patch = p.reshape(1, gh * gw, C)
    x = x + pos_patch
    cls_tok = jnp.broadcast_to(qp["cls"] + pos_cls, (B, 1, C))
    x = jnp.concatenate([cls_tok, x], axis=1)
    if cfg.num_register_tokens:
        reg = jnp.broadcast_to(qp["reg"], (B, cfg.num_register_tokens, C))
        x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)

    N = x.shape[1]
    if backend == "ref":
        attn_block = functools.partial(
            Q.qmm_attn_block_ref, batch=B, num_heads=cfg.num_heads
        )
        mlp = Q.qmm_mlp_ref
    else:
        interp = backend == "interpret"
        attn_block = functools.partial(
            Q.qmm_attn_block, batch=B, num_heads=cfg.num_heads,
            interpret=interp,
        )
        mlp = functools.partial(Q.qmm_mlp, interpret=interp)

    # pad the token axis ONCE for the whole transformer; padded keys are
    # masked out of every softmax, padded rows are sliced off at the end
    Np = _padded_tokens(B, N)
    if Np != N:
        x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
    key_bias = jnp.where(
        jnp.arange(Np) < N, 0.0, -1e9
    ).astype(jnp.float32).reshape(1, Np)

    x2 = x.reshape(B * Np, C)
    for b in qp["blocks"]:
        # whole attention sub-block in ONE kernel per batch element: qkv,
        # per-head softmax, proj, residual+LayerScale never leave VMEM
        x2 = attn_block(
            x2, b["qkv_wq"], b["qkv_ws"], b["qkv_b"],
            b["proj_wq"], b["proj_ws"], b["proj_b"],
            b["n1g"], b["n1b"], b["ls1"], key_bias,
        )
        x2 = mlp(x2,
                 b["fc1_wq"], b["fc1_ws"], b["fc1_b"],
                 b["fc2_wq"], b["fc2_ws"], b["fc2_b"],
                 b["n2g"], b["n2b"], b["ls2"])
    x = x2.reshape(B, Np, C)[:, :N]

    x_prenorm = x
    x_norm = Q._ln(x, qp["norm_g"], qp["norm_b"])
    if cfg.num_register_tokens:
        r = cfg.num_register_tokens
        x_prenorm = jnp.concatenate([x_prenorm[:, :1], x_prenorm[:, 1 + r:]], 1)
        x_norm = jnp.concatenate([x_norm[:, :1], x_norm[:, 1 + r:]], 1)
    return {"x_prenorm": x_prenorm, "x_norm": x_norm}


def ae_forward_int8(
    qp: dict, images: jnp.ndarray, cfg: ViTConfig, backend: str = "pallas"
) -> jnp.ndarray:
    """AENet contract on the int8 path: (B, 3, H, W) -> (B, P, C)
    L2-normalized pre-norm patch features (models/ae_net.py)."""
    out = vit_forward_int8(qp, images, cfg, backend=backend)
    feats = out["x_prenorm"][:, 1:, :]
    return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True).clip(1e-12)


class AENetInt8:
    """apply()-compatible stand-in for AENet running the int8 serving path.

    Built from an AENet + its trained/converted variables:
        q = AENetInt8.from_ae_net(ae_net, ae_params)
        feats = q.apply(q.params, crops)      # same call shape as AENet
    """

    def __init__(self, cfg: ViTConfig, qparams: dict, backend: str = "pallas"):
        self.cfg = cfg
        self.params = qparams
        self.backend = backend

    @classmethod
    def from_ae_net(cls, ae_net, variables: dict, backend: str = "pallas"):
        cfg = ae_net.cfg
        return cls(cfg, prepare_int8_params(variables, cfg), backend)

    @property
    def descriptor_size(self) -> int:
        return self.cfg.embed_dim

    def apply(self, qparams: dict, images: jnp.ndarray) -> jnp.ndarray:
        return ae_forward_int8(qparams, images, self.cfg, backend=self.backend)
