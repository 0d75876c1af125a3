"""Benchmark: end-to-end coarse-inference query crops/sec on one TPU chip.

Measures the full jitted pipeline per BASELINE.json's north star — DINOv2
patch features + dense 162-template patch matching + IST regression +
one-correspondence RANSAC + closed-form 6D recovery per detection crop.

Baseline: the reference repo publishes no absolute throughput (BASELINE.md);
the paper (arXiv 2311.14155) reports the coarse stage at ~48 ms/image on a
V100 for the BOP'23 suite — about 2.6 detections/image on LM-O -> ~54
crops/sec; we use 54 crops/sec as the PyTorch-reference yardstick for
`vs_baseline` and note it is an estimate, not a measured A100 number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs: GIGAPOSE_BENCH_MODEL (default dinov2_vits14),
GIGAPOSE_BENCH_BATCH (default 16), GIGAPOSE_BENCH_ITERS (default 20),
GIGAPOSE_BENCH_PALLAS / GIGAPOSE_BENCH_FUSED_ATTN / GIGAPOSE_BENCH_BF16
(kernel/dtype variants), GIGAPOSE_BENCH_MODE=onboarding (measures template
feature precompute s/object instead — the reference logs the same metric at
src/models/gigaPose.py:396-398).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _arm_watchdog(model: str, B: int):
    """The axon TPU tunnel can wedge (device init then hangs indefinitely —
    observed in round 1). Emit a sentinel JSON line and exit instead of
    hanging the driver."""
    import threading

    t = float(os.environ.get("GIGAPOSE_BENCH_WATCHDOG_S", "900"))

    def fire():
        print(
            json.dumps(
                {
                    "metric": f"coarse query crops/sec ({model}, B={B}, 162 templates)"
                              " [WATCHDOG: TPU session hung, no measurement]",
                    "value": 0.0,
                    "unit": "crops/s",
                    "vs_baseline": 0.0,
                }
            ),
            flush=True,
        )
        os._exit(3)

    timer = threading.Timer(t, fire)
    timer.daemon = True
    timer.start()
    return timer


def bench_onboarding(model: str):
    """Template onboarding throughput: AE+IST feature precompute for
    162-view objects (the set_template_data hot path, gigaPose.py:357-398)."""
    import jax
    import jax.numpy as jnp

    from gigapose_tpu.pipeline.estimator import GigaPoseEstimator
    from gigapose_tpu.pipeline.templates import onboard_templates

    n_objects = int(os.environ.get("GIGAPOSE_BENCH_OBJECTS", "4"))
    V = 162
    # shipping configuration on TPU (same defaults test.py resolves):
    # bf16 ViT matmuls + bf16 feature store
    on_tpu = jax.default_backend() == "tpu"
    vit_bf16 = os.environ.get("GIGAPOSE_BENCH_VIT_BF16", "1" if on_tpu else "0") == "1"
    store_bf16 = os.environ.get("GIGAPOSE_BENCH_BF16", "1" if on_tpu else "0") == "1"
    est = GigaPoseEstimator.create(
        model_name=model, compute_dtype="bfloat16" if vit_bf16 else None
    )
    feature_dtype = jnp.bfloat16 if store_bf16 else jnp.float32
    rng = np.random.default_rng(0)
    rgbas = [
        rng.integers(0, 256, (V, 4, 224, 224), dtype=np.uint8)
        for _ in range(n_objects)
    ]
    poses = [np.tile(np.eye(4, dtype=np.float32), (V, 1, 1)) for _ in range(n_objects)]
    # warm-up object compiles the chunked forward
    t_w = time.perf_counter()
    warm = onboard_templates(est.ae_apply, est.ist_apply, rgbas[:1], poses[:1],
                             feature_dtype=feature_dtype)
    _ = np.asarray(warm.ae_features[0, 0, 0, 0])
    print(f"[onboarding] warm-up (compile) {time.perf_counter() - t_w:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    store = onboard_templates(est.ae_apply, est.ist_apply, rgbas, poses,
                              feature_dtype=feature_dtype)
    # fence with a scalar fetch: the store stays in HBM in production (the
    # matching consumer is on-device); a full-store host fetch would bill the
    # relay's ~40 MB/s to the onboarding number
    _ = np.asarray(store.ae_features[0, 0, 0, 0])
    dt = time.perf_counter() - t0
    s_per_obj = dt / n_objects
    # yardstick: the reference logs ~2 s/object on GPU for 162xViT-L
    # (paper-scale estimate; no committed number — BASELINE.md)
    print(
        json.dumps(
            {
                "metric": f"template onboarding ({model}, 162 views)",
                "value": round(s_per_obj, 3),
                "unit": "s/object",
                "vs_baseline": round(2.0 / s_per_obj, 2),
            }
        )
    )


def main():
    model = os.environ.get("GIGAPOSE_BENCH_MODEL", "dinov2_vits14")
    # measured batch sweet spots (ROUND_NOTES r2): ViT-S peaks at B=32
    # (1322 vs 1221 crops/s), ViT-L at B=16 (433 vs 364)
    default_b = "32" if "vits" in model else "16"
    B = int(os.environ.get("GIGAPOSE_BENCH_BATCH", default_b))
    iters = int(os.environ.get("GIGAPOSE_BENCH_ITERS", "20"))
    watchdog = _arm_watchdog(model, B)

    import jax

    cache_dir = os.environ.get("GIGAPOSE_COMPILE_CACHE", "/tmp/gigapose_jax_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if os.environ.get("GIGAPOSE_BENCH_MODE") == "onboarding":
        bench_onboarding(model)
        watchdog.cancel()
        return

    # A plain `python bench.py` measures the SHIPPING configuration: on TPU
    # that is Pallas fused matching + bf16 template store + bf16 ViT matmuls
    # (the defaults test.py resolves from the model configs; each justified by
    # the BENCH r2 sweep in ROUND_NOTES.md).  Set the env knobs to 0 to
    # measure the XLA/f32 fallbacks.
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        os.environ.setdefault("GIGAPOSE_BENCH_PALLAS", "1")
        os.environ.setdefault("GIGAPOSE_BENCH_BF16", "1")
        os.environ.setdefault("GIGAPOSE_BENCH_VIT_BF16", "1")

    from __graft_entry__ import _coarse_setup

    use_pallas = os.environ.get("GIGAPOSE_BENCH_PALLAS", "0") == "1"
    fn, (ae_params, ist_vars, store, batch) = _coarse_setup(
        model, B=B, V=162, npat=16, img=224, use_pallas=use_pallas
    )
    jfn = jax.jit(fn)

    out = jfn(ae_params, ist_vars, store, batch)
    _ = np.asarray(out.poses)  # compile + warmup; host fetch forces completion

    profile_dir = os.environ.get("GIGAPOSE_BENCH_PROFILE")
    if profile_dir and os.environ.get("PALLAS_AXON_POOL_IPS"):
        # profiling needs a local backend; the remote axon relay has no
        # profiler endpoint and start_trace hangs the session (measured r2).
        # The hook itself is validated on the CPU backend (trace files in
        # plugins/profile/...).
        print("[bench] GIGAPOSE_BENCH_PROFILE ignored on the axon relay",
              file=sys.stderr, flush=True)
        profile_dir = None
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # NOTE: on the axon remote backend block_until_ready does not actually
    # block; a host fetch of the final output is the only reliable fence.
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(ae_params, ist_vars, store, batch)
    _ = np.asarray(out.poses)
    dt = time.perf_counter() - t0

    if profile_dir:
        jax.profiler.stop_trace()

    watchdog.cancel()
    crops_per_sec = B * iters / dt
    baseline = 54.0  # estimated reference coarse crops/sec (see module docstring)
    print(
        json.dumps(
            {
                "metric": f"coarse query crops/sec ({model}, B={B}, 162 templates)",
                "value": round(crops_per_sec, 2),
                "unit": "crops/s",
                "vs_baseline": round(crops_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
