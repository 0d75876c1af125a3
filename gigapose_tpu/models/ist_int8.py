"""Int8 (W8A8) serving forward for the IST ResNet backbone.

The IST backbone is the second-largest slice of the int8 serving pipeline
(bf16 stage decomposition r3: 5.77 ms of 34.6 at ViT-L B=16, a bigger
fraction at ViT-S) and sits at the ~54%-MFU XLA ceiling in bf16 — not an
implementation gap but a precision one: the v5e MXU runs int8 convolutions
at 2x the bf16 rate (394 vs 197 TOPS). This module is the conv analog of
models/vit_int8: weights pre-quantized ONCE host-side per output channel
with the BatchNorm affine FOLDED into the dequant scales (inference-mode BN
is y = s*conv + b), activations quantized dynamically per image, int8xint8
convs accumulating in int32 via XLA's native lowering
(lax.conv_general_dilated with preferred_element_type) — no custom kernel
needed for convs, the MXU path is the stock one.

backend="int8" feeds real int8 operands (TPU); backend="ref" runs the
numerically IDENTICAL fake-quant math in f32 (CPU tests; the rounding and
clipping are the same ops, only the accumulator type differs and int32 is
exact for these sizes: 3x3x512 full-scale products < 2^27).

Activation scales come in two modes:
- dynamic (default): per-image absmax, computed on the fly. Robust, but
  each conv pays an extra absmax reduction pass plus a quant pass that
  cannot fuse into the producing conv (the scale is data-dependent) —
  the measured reason the r4 on-chip A/B lost 9% to bf16 at ViT-S B=64
  despite the 2x int8 MXU rate (ROUND_NOTES).
- static (attach_static_act_scales / calibrate): per-conv scalar scales
  calibrated once host-side. The quant chain (scale, round, clip, cast)
  is then elementwise with compile-time-constant scales, so XLA fuses it
  into the previous conv's output epilogue and the inter-conv HBM tensors
  are int8 instead of f32 — the "quant folded into the conv epilogue"
  design the r4 notes scoped for a Pallas kernel, obtained from XLA's own
  conv output fusion. Out-of-range activations clip at +-127; the margin
  knob and the trained-weights selfcheck gate bound that risk.

Inference-only and OFF by default (model.serving_quant_ist) until the
on-chip A/B lands — the r3 lesson (bf16 hand-fusion lost to XLA) says ship
nothing unmeasured. Reference counterpart: the torch ResNet the reference
runs in fp32 (src/models/network/resnet.py:318-381); quantized serving is a
capability the reference does not have.

Unsupported: num_attn_heads > 0 (the SpatialTransformer stages, off in the
shipped config) — the flax path serves those.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gigapose_tpu.models.ist_net import (
    ISTBackbone, ISTNet, resize_bilinear_align_corners,
)


def _quantize_conv_weight(kernel) -> tuple:
    """HWIO f32 -> (int8 HWIO, per-output-channel scale (O,))."""
    k = np.asarray(kernel, np.float32)
    s = np.abs(k).max(axis=(0, 1, 2)) / 127.0
    s = np.maximum(s, 1e-12)
    q = np.clip(np.round(k / s), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s, jnp.float32)


def _fold_bn(p_bn: dict, s_bn: dict, eps: float = 1e-5) -> tuple:
    """Inference BN -> per-channel affine (s, b): y = s * x + b."""
    g = np.asarray(p_bn["scale"], np.float32)
    be = np.asarray(p_bn["bias"], np.float32)
    m = np.asarray(s_bn["mean"], np.float32)
    v = np.asarray(s_bn["var"], np.float32)
    s = g / np.sqrt(v + eps)
    return s, be - m * s


def prepare_int8_ist_params(ist_vars: dict, backbone: ISTBackbone) -> dict:
    """ISTNet variables -> int8 serving tree for the BACKBONE (the regressor
    MLPs are tiny and stay on the flax path)."""
    if backbone.num_attn_heads:
        raise NotImplementedError(
            "int8 IST serving supports the shipped attention-free config"
        )
    p = ist_vars["params"]["backbone"]
    bs = ist_vars.get("batch_stats", {}).get("backbone", {})

    def conv_bn(conv_name: str, bn_name: Optional[str]) -> dict:
        wq, ws = _quantize_conv_weight(p[conv_name]["kernel"])
        if bn_name is not None:
            s, b = _fold_bn(p[bn_name], bs[bn_name])
            # fold the BN scale into the dequant scale (one fused multiply)
            return {"wq": wq, "ws": ws * jnp.asarray(s), "b": jnp.asarray(b)}
        return {"wq": wq, "ws": ws, "b": jnp.zeros((wq.shape[-1],), jnp.float32)}

    out = {"conv1": conv_bn("conv1", "bn1"), "layers": []}
    strides = (1, 2, 2, 2)
    for i in range(len(backbone.block_dims)):
        for j in range(2):
            # flax nests submodule params: p["layer1_0"]["conv1"]...
            name = f"layer{i + 1}_{j}"
            sub = p[name]
            sub_bs = bs.get(name, {})

            def sub_conv_bn(cn, bn):
                wq, ws = _quantize_conv_weight(sub[cn]["kernel"])
                s, b = _fold_bn(sub[bn], sub_bs[bn])
                return {"wq": wq, "ws": ws * jnp.asarray(s), "b": jnp.asarray(b)}

            # NOTE: strides are NOT stored in the tree (they must stay
            # static under jit); the forward re-derives them from position
            blk = {
                "conv1": sub_conv_bn("conv1", "bn1"),
                "conv2": sub_conv_bn("conv2", "bn2"),
            }
            if (strides[i] if j == 0 else 1) != 1:
                blk["down"] = sub_conv_bn("down_conv", "down_bn")
            out["layers"].append(blk)
    out["out"] = conv_bn("out_conv", None)
    return out


def _qconv(
    x: jnp.ndarray, layer: dict, stride: int, pad: int, backend: str,
    collect: Optional[list] = None,
) -> jnp.ndarray:
    """Activation quant -> int8 conv (int32 accum) -> fused dequant +
    folded-BN affine. x: (B, H, W, C) f32, NHWC/HWIO. A static per-conv
    scale ("sa" in the layer tree) skips the absmax pass and lets the quant
    chain fuse into x's producer; otherwise the scale is the dynamic
    per-image absmax. `collect` (calibration) appends this conv's input
    absmax."""
    if collect is not None:
        collect.append(jnp.max(jnp.abs(x)))
    sa = layer.get("sa")
    if sa is not None:
        sx = sa  # scalar jnp constant -> whole chain is fusible elementwise
    else:
        sx = jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True) / 127.0
        sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(jnp.round(x / sx), -127, 127)
    wq = layer["wq"]
    dn = lax.conv_dimension_numbers(x.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
    padding = ((pad, pad), (pad, pad))
    if backend == "int8":
        acc = lax.conv_general_dilated(
            xq.astype(jnp.int8), wq, (stride, stride), padding,
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:  # "ref": identical math, f32 accumulation (exact for these sizes)
        acc = lax.conv_general_dilated(
            xq, wq.astype(jnp.float32), (stride, stride), padding,
            dimension_numbers=dn,
        )
    return acc * (sx * layer["ws"]) + layer["b"]


def ist_features_int8(
    qp: dict, images: jnp.ndarray, input_size: int = 256,
    backend: str = "int8", _collect: Optional[list] = None,
) -> jnp.ndarray:
    """(B, 3, H, W) -> (B, P, C) stride-16 descriptors; the ISTBackbone
    contract (ist_net.py)."""
    x = jnp.transpose(images, (0, 2, 3, 1)).astype(jnp.float32)
    x = resize_bilinear_align_corners(x, (input_size, input_size))
    x = jax.nn.relu(
        _qconv(x, qp["conv1"], stride=2, pad=3, backend=backend,
               collect=_collect)
    )
    stage_strides = (1, 2, 2, 2)
    for idx, blk in enumerate(qp["layers"]):
        # layers are [stage0_blk0, stage0_blk1, stage1_blk0, ...]; only the
        # first block of a stage strides (static — never in the pytree)
        stride = stage_strides[idx // 2] if idx % 2 == 0 else 1
        y = jax.nn.relu(
            _qconv(x, blk["conv1"], stride, 1, backend, collect=_collect)
        )
        y = _qconv(y, blk["conv2"], 1, 1, backend, collect=_collect)
        if "down" in blk:
            x = _qconv(x, blk["down"], stride, 0, backend, collect=_collect)
        x = jax.nn.relu(x + y)
    x = _qconv(x, qp["out"], 1, 0, backend, collect=_collect)
    B, H, W, C = x.shape
    return x.reshape(B, H * W, C)


def ist_act_absmax(
    qp: dict, images: jnp.ndarray, input_size: int = 256,
    backend: str = "ref",
) -> List[float]:
    """Calibration pass: per-conv INPUT absmax over `images`, in the exact
    _qconv call order of ist_features_int8 (the order
    attach_static_act_scales consumes). Runs the quantized forward itself so
    deep-layer stats reflect the serving distribution, not the f32 one."""
    collected: list = []
    ist_features_int8(qp, images, input_size, backend, _collect=collected)
    return [float(a) for a in collected]


def attach_static_act_scales(
    qp: dict, absmaxes: List[float], margin: float = 1.0
) -> dict:
    """Attach static activation scales ("sa") to a quantized param tree, in
    forward _qconv order (conv1; per block: conv1, conv2, down?; out).
    margin > 1 leaves headroom above the calibration absmax before the
    int8 clip bites."""
    it = iter(absmaxes)

    def nxt(layer: dict) -> dict:
        sa = max(float(next(it)) * margin / 127.0, 1e-12)
        return {**layer, "sa": jnp.asarray(sa, jnp.float32)}

    out = {"conv1": nxt(qp["conv1"]), "layers": []}
    for blk in qp["layers"]:
        b = {"conv1": nxt(blk["conv1"]), "conv2": nxt(blk["conv2"])}
        if "down" in blk:
            b["down"] = nxt(blk["down"])
        out["layers"].append(b)
    out["out"] = nxt(qp["out"])
    leftovers = sum(1 for _ in it)
    if leftovers:
        raise ValueError(f"{leftovers} unconsumed calibration scales")
    return out


class ISTNetInt8:
    """apply()-compatible stand-in for ISTNet with the BACKBONE on the int8
    serving path; `regress` (and anything else) delegates to the wrapped
    flax net. Combined variables: {"q": <int8 tree>, "flax": <ISTNet vars>}.

        q = ISTNetInt8.from_ist_net(ist_net, ist_vars)
        feats = q.apply(q.variables, crops, method=q.features)
        res = q.apply(q.variables, sf, tf, sp, tp, method=q.regress)
    """

    def __init__(self, flax_net: ISTNet, variables: dict, backend: str = "int8",
                 static_scales: bool = False):
        self.flax_net = flax_net
        self.variables = variables
        self.backend = backend
        self.input_size = flax_net.backbone.input_size
        # static_scales=True requests calibrated static activation scales;
        # the calibration itself needs serving-distribution images, so it
        # happens at template onboarding (CoarseRunner._maybe_calibrate_ist)
        # — static_pending tells the runner to do it before any extraction.
        self.static_scales = static_scales

    @property
    def static_pending(self) -> bool:
        return self.static_scales and "sa" not in self.variables["q"]["conv1"]

    @classmethod
    def from_ist_net(cls, ist_net: ISTNet, ist_vars: dict,
                     backend: str = "int8",
                     static_scales: bool = False) -> "ISTNetInt8":
        combined = {
            "q": prepare_int8_ist_params(ist_vars, ist_net.backbone),
            "flax": ist_vars,
        }
        return cls(ist_net, combined, backend, static_scales=static_scales)

    def calibrate(self, images: jnp.ndarray, margin: float = 1.0) -> "ISTNetInt8":
        """Switch to STATIC activation scales calibrated on `images` (e.g.
        the first template-onboarding crops — the serving distribution).
        Mutates self.variables; callers holding a reference to the old tree
        (estimator.ist_vars) must re-fetch it — the pytree structure changes,
        which also retriggers jit tracing."""
        q = self.variables["q"]
        absmaxes = ist_act_absmax(q, images, self.input_size, self.backend)
        self.variables = {
            **self.variables,
            "q": attach_static_act_scales(q, absmaxes, margin),
        }
        return self

    # method markers (compared by identity inside apply)
    def features(self, images, train: bool = False):
        raise RuntimeError("call via apply(vars, images, method=net.features)")

    def regress(self, *args, **kw):
        raise RuntimeError("call via apply(vars, ..., method=net.regress)")

    def apply(self, variables: dict, *args, method=None, train: bool = False,
              **kw):
        if train:
            raise NotImplementedError("int8 IST serving is inference-only")
        name = getattr(method, "__name__", None) if method is not None else None
        if method is None or name == "features":
            return ist_features_int8(
                variables["q"], args[0], self.input_size, self.backend
            )
        # everything else (regress, __call__ with points) -> flax net
        flax_method = getattr(self.flax_net, name)
        return self.flax_net.apply(
            variables["flax"], *args, method=flax_method, **kw
        )
