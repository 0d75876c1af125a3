"""Benchmark: end-to-end coarse-inference query crops/sec on one TPU chip.

Measures the full jitted pipeline per BASELINE.json's north star — DINOv2
patch features + dense 162-template patch matching + IST regression +
one-correspondence RANSAC + closed-form 6D recovery per detection crop.

A plain `python bench.py` measures BOTH backbones in their shipping
configurations and prints one JSON line each: dinov2_vits14 first, then
dinov2_vitl14 — the reference's *default* backbone
(/root/reference/configs/model/ae_net/dinov2_l.yaml:2) — LAST, so the
driver-parsed headline line is the honest reference-default number.

Baseline: the reference repo publishes no absolute throughput (BASELINE.md);
the paper (arXiv 2311.14155) reports the coarse stage at ~48 ms/image on a
V100 for the BOP'23 suite — about 2.6 detections/image on LM-O -> ~54
crops/sec; we use 54 crops/sec as the PyTorch-reference yardstick for
`vs_baseline` and note it is an estimate, not a measured A100 number
(full derivation: BASELINE.md "The 54 crops/s yardstick — provenance").

Env knobs: GIGAPOSE_BENCH_MODEL (force a single backbone),
GIGAPOSE_BENCH_BATCH (default: the per-model measured sweet spot),
GIGAPOSE_BENCH_ITERS (default 20), GIGAPOSE_BENCH_PALLAS /
GIGAPOSE_BENCH_BF16 / GIGAPOSE_BENCH_VIT_BF16
(kernel/dtype variants), GIGAPOSE_BENCH_MODE=onboarding (template feature
precompute s/object — the reference logs the same metric at
src/models/gigaPose.py:396-398), GIGAPOSE_BENCH_MODE=train (training step
steps/s + MFU — the reference's train.py:20-104 counterpart, BASELINE
config 5), GIGAPOSE_BENCH_MODE=stages (per-stage AE/IST/matching
decomposition — the speed-of-light table in ROUND_NOTES).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


class _Watchdog:
    """The axon TPU tunnel can wedge (device init then hangs indefinitely —
    observed in round 1). Emit a sentinel JSON line and exit instead of
    hanging the driver.

    Progress-aware: pet() re-arms the timer, so the budget bounds time since
    the last *milestone* (a model's compile or measurement finishing), not
    the whole multi-model run — a cold-cache two-backbone bench legitimately
    exceeds 30 min total and must not be self-killed mid-session (a killed
    claim wedges the relay for hours, r3 incident)."""

    def __init__(self, label: str):
        import threading

        self._threading = threading
        self._t = float(os.environ.get("GIGAPOSE_BENCH_WATCHDOG_S", "1800"))
        self._label = label
        self._timer = None
        self.pet()

    def _fire(self):
        print(
            json.dumps(
                {
                    "metric": (
                        f"{self._label} [WATCHDOG: TPU session hung, "
                        "no measurement]"
                    ),
                    "value": 0.0,
                    "unit": "crops/s",
                    "vs_baseline": 0.0,
                }
            ),
            flush=True,
        )
        os._exit(3)

    def pet(self):
        if self._timer is not None:
            self._timer.cancel()
        self._timer = self._threading.Timer(self._t, self._fire)
        self._timer.daemon = True
        self._timer.start()

    def cancel(self):
        if self._timer is not None:
            self._timer.cancel()


def _arm_watchdog(label: str):
    return _Watchdog(label)


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
    if os.environ.get("GIGAPOSE_BENCH_QUANT", "0") == "1":
        # the shipping serving config (test.py serving_quant=auto on TPU)
        # onboards with the SAME int8 extractor the queries use; feature
        # precompute is AE-forward-bound, so int8 moves s/object toward the
        # upload floor (VERDICT r3 #7)
        est.quantize_serving()
    feature_dtype = jnp.bfloat16 if store_bf16 else jnp.float32
    rng = np.random.default_rng(0)
    rgbas = [
        rng.integers(0, 256, (V, 4, 224, 224), dtype=np.uint8)
        for _ in range(n_objects)
    ]
    poses = [np.tile(np.eye(4, dtype=np.float32), (V, 1, 1)) for _ in range(n_objects)]
    # warm-up object compiles the chunked forward
    t_w = time.perf_counter()
    warm = onboard_templates(est.ae_apply_pair, est.ist_apply_pair, rgbas[:1], poses[:1],
                             feature_dtype=feature_dtype)
    _ = np.asarray(warm.ae_features[0, 0, 0, 0])
    print(f"[onboarding] warm-up (compile) {time.perf_counter() - t_w:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    store = onboard_templates(est.ae_apply_pair, est.ist_apply_pair, rgbas, poses,
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
                "metric": (
                    f"template onboarding ({model}, 162 views"
                    + (", int8 extractor)"
                       if os.environ.get("GIGAPOSE_BENCH_QUANT", "0") == "1"
                       else ")")
                ),
                "value": round(s_per_obj, 3),
                "unit": "s/object",
                "vs_baseline": round(2.0 / s_per_obj, 2),
            }
        )
    )


def bench_train(model: str):
    """Training-step throughput (BASELINE config 5; the reference counterpart
    is the PL-DDP loop at /root/reference/train.py:20-104). Reports steps/s;
    vs_baseline carries the measured MFU (no published reference number)."""
    import jax
    import jax.numpy as jnp

    from gigapose_tpu.models.ae_net import AENet
    from gigapose_tpu.models.ist_net import default_ist_net
    from gigapose_tpu.training.state import (
        OptimConfig, TrainBatch, create_train_state, train_step,
    )

    B = int(os.environ.get("GIGAPOSE_BENCH_BATCH", "12"))  # ref machine batch 12
    iters = int(os.environ.get("GIGAPOSE_BENCH_ITERS", "10"))
    on_tpu = jax.default_backend() == "tpu"
    vit_bf16 = os.environ.get("GIGAPOSE_BENCH_VIT_BF16", "1" if on_tpu else "0") == "1"
    compute_dtype = "bfloat16" if vit_bf16 else None

    # remat sweep knob: 0 = off, 1 = full per-block, or a
    # jax.checkpoint_policies name (e.g. dots_saveable)
    remat_env = os.environ.get("GIGAPOSE_BENCH_REMAT", "0")
    remat = {"0": False, "1": True}.get(remat_env, remat_env)
    # train-forward HBM-residue A/B knobs (VERDICT r4 #2); all default off
    fuse_ist = os.environ.get("GIGAPOSE_BENCH_FUSE_IST", "0") == "1"
    nce_bf16 = os.environ.get("GIGAPOSE_BENCH_NCE_BF16", "0") == "1"
    bn_bf16 = os.environ.get("GIGAPOSE_BENCH_BN_BF16", "0") == "1"
    # GIGAPOSE_BENCH_KNOB_SWEEP: comma list of knob configs A/B'd warm in
    # THIS process (relay run-to-run variance is ±6%; only in-process
    # comparisons are trustworthy — CLAUDE.md r3 lessons). Names:
    # base | fuse_ist | nce_bf16 | bn_bf16 | all
    sweep = os.environ.get("GIGAPOSE_BENCH_KNOB_SWEEP")
    if sweep:
        configs = []
        for name in sweep.split(","):
            name = name.strip()
            configs.append((name, {
                "base": (False, False, False),
                "fuse_ist": (True, False, False),
                "nce_bf16": (False, True, False),
                "bn_bf16": (False, False, True),
                "all": (True, True, True),
            }[name]))
    else:
        configs = [("env", (fuse_ist, nce_bf16, bn_bf16))]

    rng = np.random.default_rng(0)
    P = 256
    pts = rng.integers(0, 16, size=(B, P, 2)).astype(np.float32)
    pts[:, P // 2:] = -1.0  # half the correspondences invalid, like real pairs
    batch = TrainBatch(
        src_img=jnp.asarray(rng.normal(size=(B, 3, 224, 224)), jnp.float32),
        tar_img=jnp.asarray(rng.normal(size=(B, 3, 224, 224)), jnp.float32),
        src_pts=jnp.asarray(pts),
        tar_pts=jnp.asarray(pts),
        rel_scale=jnp.ones((B,), jnp.float32),
        rel_inplane=jnp.zeros((B,), jnp.float32),
    )

    import functools

    fwd_only_mode = os.environ.get("GIGAPOSE_BENCH_TRAIN_FWD", "0") == "1"

    def run_config(name, fuse_ist, nce_bf16, bn_bf16):
        knobs = "".join(
            f" {k}" for k, on in
            [("fuse_ist", fuse_ist), ("nce_bf16", nce_bf16),
             ("bn_bf16", bn_bf16)]
            if on
        )
        ae_net = AENet(model_name=model, compute_dtype=compute_dtype,
                       remat=remat)
        ist_net = default_ist_net(
            compute_dtype=compute_dtype,
            norm_dtype="bfloat16" if bn_bf16 else None,
        )
        cfg = OptimConfig(fuse_ist_pair=fuse_ist,
                          nce_dtype="bf16" if nce_bf16 else None)
        state, tx = create_train_state(ae_net, ist_net, jax.random.PRNGKey(0),
                                       cfg)

        # GIGAPOSE_BENCH_TRAIN_FWD=1: measure the LOSS FORWARD alone (no
        # grad, no optimizer) — the decomposition point for the train-MFU
        # floor analysis (fwd MFU vs full-step MFU isolates the backward).
        if fwd_only_mode:
            from gigapose_tpu.training.state import compute_losses

            def fwd_only(state, batch):
                params = {"ae": state.ae_params, "ist": state.ist_params}
                total, (metrics, _) = compute_losses(
                    ae_net, ist_net, params, state.ist_batch_stats, batch,
                    state.step, cfg,
                )
                return state, metrics

            jfn = jax.jit(fwd_only)
            step_label = "train LOSS-FWD-only"
        else:
            jfn = jax.jit(
                functools.partial(train_step, ae_net, ist_net, tx, cfg),
                donate_argnums=0,  # in-place param/opt-state buffers
            )
            step_label = "train step"
        lowered = jfn.lower(state, batch)
        compiled = lowered.compile()
        try:
            flops_per_step = float(compiled.cost_analysis()["flops"])
        except Exception:
            flops_per_step = 0.0

        state, metrics = jfn(state, batch)
        _ = np.asarray(metrics["total"])  # compile+warm; host fetch = fence
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = jfn(state, batch)
        _ = np.asarray(metrics["total"])
        dt = time.perf_counter() - t0
        steps_per_s = iters / dt
        peak = 197e12 if on_tpu else 0  # v5e bf16 peak
        mfu = (flops_per_step * steps_per_s / peak) if peak else 0.0
        print(
            json.dumps(
                {
                    "metric": (
                        f"{step_label} throughput ({model}, B={B}, "
                        f"{'bf16' if vit_bf16 else 'f32'}, "
                        f"remat={remat_env}{knobs}) "
                        "[vs_baseline = MFU; no published reference number]"
                    ),
                    "value": round(steps_per_s, 3),
                    "unit": "steps/s",
                    "vs_baseline": round(mfu, 3),
                }
            ),
            flush=True,
        )
        print(f"[train] {name}: {steps_per_s:.3f} steps/s "
              f"({steps_per_s * B:.1f} samples/s, MFU {mfu:.3f})",
              file=sys.stderr, flush=True)

    for name, (fi, nb, bb) in configs:
        run_config(name, fi, nb, bb)  # state freed per call (no refs kept)


def _write_sphere_ply(path: str, radius_m: float, levels: int):
    """Subdivided-icosahedron PLY at a BOP-realistic face count
    (levels=5 -> 20480 faces / 10242 verts), so the refine A/B charges the
    device rasterizer its honest per-face cost (a 12-face cube would not)."""
    from gigapose_tpu.lib3d.icosphere import (
        _BLENDER_ICOFACE, _BLENDER_ICOVERT, _subdivide_f32)

    verts = [(v / 200.0).astype(np.float32) for v in _BLENDER_ICOVERT]
    faces = list(_BLENDER_ICOFACE)
    for _ in range(levels):
        verts, faces = _subdivide_f32(verts, faces, spherize=True)
        verts = list(verts)
    V = np.stack(verts) * radius_m
    F = np.asarray(faces, np.int32)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(V)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
                f"element face {len(F)}\n"
                "property list uchar int vertex_indices\nend_header\n")
        for v in V:
            # position-dependent albedo so renders carry texture signal
            c = (np.abs(v / radius_m) * 155 + 100).astype(int)
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f} {c[0]} {c[1]} {c[2]}\n")
        for a, b, c in F:
            f.write(f"3 {a} {b} {c}\n")


def bench_refine():
    """Render-and-compare refinement throughput (the reference's 5-iteration
    MegaPose refiner path, pose_estimator.py:102-216), measured end-to-end as
    refined crops/s. A/Bs the three backends (VERDICT r4 next-round #1):
      host      — C++ raster + per-iteration device round trips (the
                  reference's structure),
      pipelined — host raster of chunk i+1 overlapped with chunk i's device
                  steps (the reference's worker-pool pipelining),
      device    — the whole loop ONE jitted XLA program with on-TPU raster
                  (refiner/device_render.py), zero host round trips.
    Emits the winner; GIGAPOSE_BENCH_REFINE_BACKEND pins one. The reference
    commits no number for this stage (BASELINE.md), so vs_baseline is 0.0."""
    import tempfile

    from gigapose_tpu.refiner.refiner import RefinerConfig, RenderCompareRefiner

    B = int(os.environ.get("GIGAPOSE_BENCH_BATCH", "16"))
    iters = int(os.environ.get("GIGAPOSE_BENCH_ITERS", "3"))
    levels = int(os.environ.get("GIGAPOSE_BENCH_MESH_LEVELS", "5"))
    only = os.environ.get("GIGAPOSE_BENCH_REFINE_BACKEND")  # host|pipelined|device
    with tempfile.TemporaryDirectory() as td:
        meshes = {}
        for label, radius in [(1, 0.04), (2, 0.05)]:
            path = os.path.join(td, f"obj_{label}.ply")
            _write_sphere_ply(path, radius_m=radius, levels=levels)
            meshes[label] = path
        base = RenderCompareRefiner.create(meshes, config=RefinerConfig())
        K = np.array([[572.4114, 0, 320], [0, 573.57043, 240], [0, 0, 1.0]],
                     np.float32)
        rng = np.random.default_rng(0)
        labels = np.array([1 + i % 2 for i in range(B)])
        gts, imgs = [], []
        for i in range(B):
            gt = np.eye(4, dtype=np.float32)
            gt[:3, 3] = [rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05),
                         rng.uniform(0.45, 0.6)]
            rgba, _ = base.meshes.rasterizers[int(labels[i])].render(
                K, gt, 640, 480
            )
            imgs.append(rgba[..., :3].transpose(2, 0, 1).astype(np.float32) / 255.0)
            gts.append(gt)
        images = np.stack(imgs)
        Ks = np.tile(K[None], (B, 1, 1))
        inits = np.stack(gts)
        inits[:, :3, 3] += rng.uniform(-0.02, 0.02, (B, 3)).astype(np.float32)

        # comma list -> one device@N variant per face budget, A/B'd warm in
        # THIS process (run-to-run relay variance is ±6%; in-process A/Bs
        # are the only trustworthy comparisons — CLAUDE.md r3 lessons)
        dev_faces = os.environ.get("GIGAPOSE_BENCH_DEVICE_MAX_FACES")
        dev_chunk = int(os.environ.get("GIGAPOSE_BENCH_DEVICE_CHUNK", "64"))
        backends = {
            "host": RefinerConfig(pipeline_chunks=1),  # unpipelined baseline
            "pipelined": RefinerConfig(pipeline_chunks=2),
        }
        for budget in (dev_faces.split(",") if dev_faces else [""]):
            name = f"device@{budget}" if budget else "device"
            backends[name] = RefinerConfig(
                renderer="device",
                device_max_faces=int(budget) if budget else None,
                device_chunk=dev_chunk,
            )
        if only:
            backends = {k: v for k, v in backends.items()
                        if k == only or (only == "device" and
                                         k.startswith("device"))}
        results = {}
        for name, cfg in backends.items():
            ref = RenderCompareRefiner(
                base.refiner_net, base.refiner_vars, base.scorer_net,
                base.scorer_vars, base.meshes, cfg,
            )
            t_c0 = time.perf_counter()
            out, scores = ref.refine_batch(images, Ks, labels, inits)  # compile
            compile_s = time.perf_counter() - t_c0
            assert np.isfinite(out).all()
            if name == "host":
                ref.timing = {}  # host-render vs device-step split
            t0 = time.perf_counter()
            for _ in range(iters):
                out, scores = ref.refine_batch(images, Ks, labels, inits)
            _ = float(scores[0])  # refine_batch returns host arrays (fenced)
            dt = time.perf_counter() - t0
            results[name] = B * iters / dt
            extra = ""
            if ref.timing:
                split = {k: round(v / iters * 1e3, 1)
                         for k, v in ref.timing.items()}
                extra = f" | phase split (ms/call): {split}"
            print(f"[refine] {name}: {results[name]:.2f} crops/s "
                  f"({dt / iters * 1e3:.1f} ms/call, compile {compile_s:.1f} s)"
                  f"{extra}", file=sys.stderr, flush=True)
        winner = max(results, key=results.get)
    n_it = RefinerConfig().n_iterations
    print(
        json.dumps(
            {
                "metric": (
                    f"refiner crops/sec (render-and-compare, {n_it} "
                    f"iterations, B={B}, backend={winner}) "
                    "[no published reference number]"
                ),
                "value": round(results[winner], 2),
                "unit": "crops/s",
                "vs_baseline": 0.0,
            }
        ),
        flush=True,
    )


def bench_stages(model: str):
    """Per-stage decomposition of the coarse pipeline (the speed-of-light
    table in ROUND_NOTES): AE ViT forward, IST backbone, Pallas matching,
    and the full pipeline, independently timed on the chip."""
    import jax
    import jax.numpy as jnp

    from gigapose_tpu.models.ae_net import AENet
    from gigapose_tpu.models.ist_net import default_ist_net
    from gigapose_tpu.ops.pallas_matching import pallas_match_scores
    from gigapose_tpu.models.vit import VIT_CONFIGS

    # GIGAPOSE_BENCH_QUANT=1 decomposes the SHIPPING int8 pipeline at its
    # own batch sweet spots (VERDICT r4 next-round #6) — the AE stage then
    # runs the fused W8A8 kernels (models/vit_int8), exactly what
    # bench_coarse's serving path uses
    quant = os.environ.get("GIGAPOSE_BENCH_QUANT", "0") == "1"
    if quant:
        default_b = "64" if "vits" in model else "32"
    else:
        default_b = "32" if "vits" in model else "16"
    B = int(os.environ.get("GIGAPOSE_BENCH_BATCH", default_b))
    iters = int(os.environ.get("GIGAPOSE_BENCH_ITERS", "20"))
    on_tpu = jax.default_backend() == "tpu"
    cdt = "bfloat16" if os.environ.get(
        "GIGAPOSE_BENCH_VIT_BF16", "1" if on_tpu else "0") == "1" else None
    fdt = jnp.bfloat16 if os.environ.get(
        "GIGAPOSE_BENCH_BF16", "1" if on_tpu else "0") == "1" else jnp.float32

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 3, 224, 224)), jnp.float32)

    def timed(f, *args, fence):
        out = f(*args)
        np.asarray(fence(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        np.asarray(fence(out))
        return (time.perf_counter() - t0) / iters * 1e3

    ae = AENet(model_name=model, compute_dtype=cdt)
    pa = ae.init(jax.random.PRNGKey(0), x[:1])
    if quant:
        from gigapose_tpu.models.vit_int8 import AENetInt8

        # interpret mode off-TPU so the mode stays smoke-testable on CPU
        ae_q = AENetInt8.from_ae_net(
            ae, pa, backend="pallas" if on_tpu else "interpret"
        )
        qp = ae_q.params
        ae_ms = timed(jax.jit(lambda p, x: ae_q.apply(p, x)), qp, x,
                      fence=lambda o: o[0, 0, 0])
    else:
        ae_ms = timed(jax.jit(lambda p, x: ae.apply(p, x)), pa, x,
                      fence=lambda o: o[0, 0, 0])

    ist = default_ist_net(compute_dtype=cdt)
    iv = ist.init(jax.random.PRNGKey(1), x[:1], x[:1],
                  jnp.zeros((1, 4, 2)), jnp.zeros((1, 4, 2)))
    ist_ms = timed(jax.jit(lambda v, x: ist.apply(v, x, method=ist.features)),
                   iv, x, fence=lambda o: o[0, 0, 0])

    P, C, V = 256, VIT_CONFIGS[model].embed_dim, 162
    tar = jnp.asarray(rng.normal(size=(B, P, C)), fdt)
    store = jnp.asarray(rng.normal(size=(1, V, P, C)), fdt)
    tmask = jnp.ones((B, P), jnp.float32)
    smask = jnp.ones((1, V, P), jnp.float32)
    labels = jnp.zeros((B,), jnp.int32)
    match_ms = timed(
        jax.jit(lambda t, s, tm, sm, l: pallas_match_scores(t, s, tm, sm, l)),
        tar, store, tmask, smask, labels, fence=lambda o: o[0],
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"coarse stage decomposition ({model}, B={B}, "
                    f"AE={'int8' if quant else 'bf16' if cdt else 'f32'}): "
                    f"AE {ae_ms:.2f} ms, IST {ist_ms:.2f} ms, "
                    f"matching {match_ms:.2f} ms"
                ),
                "value": round(ae_ms + ist_ms + match_ms, 2),
                "unit": "ms/batch (sum of stages)",
                "vs_baseline": 0.0,
            }
        )
    )


def bench_istq():
    """3-way IST-backbone A/B at the int8 serving batch, warm in ONE process
    (the r3 A/B discipline): bf16 flax vs int8 DYNAMIC per-image scales
    (the r4 loser — each conv pays an absmax reduction + an unfusible quant
    pass) vs int8 STATIC calibrated scales (quant folds into the producing
    conv's epilogue via XLA output fusion; models/ist_int8 docstring). The
    ViT-S int8 pipeline is IST-bound (55% of the stage sum at B=64,
    ROUND_NOTES r5 stage table), so this is the one remaining single-chip
    lever the r5 decomposition named."""
    import jax
    import jax.numpy as jnp

    from gigapose_tpu.models.ist_net import default_ist_net
    from gigapose_tpu.models.ist_int8 import (
        attach_static_act_scales, ist_act_absmax, ist_features_int8,
        prepare_int8_ist_params,
    )

    B = int(os.environ.get("GIGAPOSE_BENCH_BATCH", "64"))
    iters = int(os.environ.get("GIGAPOSE_BENCH_ITERS", "20"))
    on_tpu = jax.default_backend() == "tpu"
    cdt = "bfloat16" if on_tpu else None
    qbackend = "int8" if on_tpu else "ref"

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 3, 224, 224)), jnp.float32)

    def timed(f, *args):
        out = f(*args)
        np.asarray(out[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        np.asarray(out[0, 0, 0])
        return (time.perf_counter() - t0) / iters * 1e3

    ist = default_ist_net(compute_dtype=cdt)
    iv = ist.init(jax.random.PRNGKey(1), x[:1], x[:1],
                  jnp.zeros((1, 4, 2)), jnp.zeros((1, 4, 2)))
    flax_ms = timed(
        jax.jit(lambda v, x: ist.apply(v, x, method=ist.features)), iv, x
    )

    qp = prepare_int8_ist_params(iv, ist.backbone)
    size = ist.backbone.input_size
    dyn_ms = timed(
        jax.jit(lambda q, x: ist_features_int8(q, x, size, qbackend)), qp, x
    )

    qp_s = attach_static_act_scales(
        qp, ist_act_absmax(qp, x[:4], size, qbackend), margin=1.1
    )
    sta_ms = timed(
        jax.jit(lambda q, x: ist_features_int8(q, x, size, qbackend)), qp_s, x
    )

    print(
        json.dumps(
            {
                "metric": (
                    f"IST backbone A/B (B={B}): flax "
                    f"{'bf16' if cdt else 'f32'} {flax_ms:.2f} ms, int8 "
                    f"dynamic-scale {dyn_ms:.2f} ms, int8 static-scale "
                    f"{sta_ms:.2f} ms"
                ),
                "value": round(sta_ms, 2),
                "unit": "ms/batch (int8 static)",
                "vs_baseline": round(flax_ms / sta_ms, 3),
            }
        ),
        flush=True,
    )


def bench_sharded(model: str):
    """Single-chip overhead bound for the view-sharded store (VERDICT r4
    next-round #7): coarse_forward_sharded on a (dp=1, tv=1) mesh vs the
    plain jitted pipeline, A/B'd warm in ONE process. The delta bounds the
    shard_map wrapper + per-shard top-k + candidate merge + psum-gather
    machinery that a tv>1 deployment pays on every chip; the collective
    payload arithmetic lives in parallel/sharded_store.py's docstring."""
    import functools

    import jax

    from __graft_entry__ import _coarse_setup
    from gigapose_tpu.parallel.sharded_store import (
        coarse_forward_sharded, make_dp_tv_mesh, shard_template_store,
    )

    quant = os.environ.get("GIGAPOSE_BENCH_QUANT", "0") == "1"
    if "vits" in model:
        default_b = "64" if quant else "32"
    else:
        default_b = "32" if quant else "16"
    B = int(os.environ.get("GIGAPOSE_BENCH_BATCH", default_b))
    iters = int(os.environ.get("GIGAPOSE_BENCH_ITERS", "20"))
    use_pallas = os.environ.get("GIGAPOSE_BENCH_PALLAS", "0") == "1"

    fn, (ae_params, ist_vars, store, batch), est = _coarse_setup(
        model, B=B, V=162, npat=16, img=224, use_pallas=use_pallas,
        return_est=True,
    )
    mesh = make_dp_tv_mesh(1, 1)
    sstore = shard_template_store(store, mesh)
    jplain = jax.jit(fn)
    jshard = jax.jit(functools.partial(
        coarse_forward_sharded, est.ae_net, est.ist_net,
        mesh=mesh, cfg=est.config,
    ))

    def timed(jfn, st):
        out = jfn(ae_params, ist_vars, st, batch)
        _ = np.asarray(out.poses)  # compile + warm; host fetch = fence
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(ae_params, ist_vars, st, batch)
        _ = np.asarray(out.poses)
        return (time.perf_counter() - t0) / iters * 1e3

    plain_ms = timed(jplain, store)
    shard_ms = timed(jshard, sstore)
    overhead = shard_ms / plain_ms - 1.0
    print(f"[sharded] plain {plain_ms:.2f} ms vs (dp=1,tv=1) sharded "
          f"{shard_ms:.2f} ms -> overhead {overhead * 100:.1f}%",
          file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "metric": (
                    f"sharded-store single-chip overhead ({model}, B={B}, "
                    f"plain {plain_ms:.2f} ms vs tv=1 sharded "
                    f"{shard_ms:.2f} ms) [vs_baseline = overhead fraction]"
                ),
                "value": round(shard_ms, 2),
                "unit": "ms/batch",
                "vs_baseline": round(overhead, 4),
            }
        ),
        flush=True,
    )


def bench_e2e(model: str):
    """End-to-end test.py wall-clock (VERDICT r4 next-round #8): the north
    star is query crops/s INCLUDING host decode, RLE mask decode, device
    crop, bucket padding, RANSAC glue, and csv writing — bench_coarse only
    times the jitted device pipeline on synthetic tensors. Drives the real
    CoarseRunner.run over a generated BOP-format fixture (n images x m
    CNOS detections, full 162-view store) with the shipping serving config;
    pass 1 compiles, pass 2 is the measurement."""
    import shutil

    from tests import synthetic_bop
    from gigapose_tpu.dataloader.test_set import InferenceDataset
    from gigapose_tpu.pipeline.estimator import (
        EstimatorConfig, GigaPoseEstimator,
    )
    from gigapose_tpu.pipeline.runner import CoarseRunner

    import jax.numpy as jnp

    n_imgs = int(os.environ.get("GIGAPOSE_BENCH_E2E_IMAGES", "8"))
    n_inst = int(os.environ.get("GIGAPOSE_BENCH_E2E_DETS", "8"))
    root = "/tmp/gigapose_bench_e2e"
    shutil.rmtree(root, ignore_errors=True)
    synthetic_bop.build(root, num_templates=162, n_test_images=n_imgs,
                        insts_per_image=n_inst)
    datasets = os.path.join(root, "datasets")

    use_pallas = os.environ.get("GIGAPOSE_BENCH_PALLAS", "0") == "1"
    quant = os.environ.get("GIGAPOSE_BENCH_QUANT", "0") == "1"
    bf16_store = os.environ.get("GIGAPOSE_BENCH_BF16", "0") == "1"
    vit_bf16 = os.environ.get("GIGAPOSE_BENCH_VIT_BF16", "0") == "1"
    est = GigaPoseEstimator.create(
        model_name=model,
        config=EstimatorConfig(use_pallas_matching=use_pallas),
        compute_dtype="bfloat16" if vit_bf16 else None,
    )
    if quant:
        est.quantize_serving()
    t_onb = time.perf_counter()
    runner = CoarseRunner.onboard(
        est, template_dir=os.path.join(datasets, "templates", "tudl"),
        save_dir=os.path.join(root, "results", "bench"),
        dataset_name="tudl",
        feature_dtype=jnp.bfloat16 if bf16_store else None,
    )
    t_onb = time.perf_counter() - t_onb
    dataset = InferenceDataset(root_dir=datasets, dataset_name="tudl")
    runner.run(dataset, model_name="bench", run_id="warm")  # compile pass
    t0 = time.perf_counter()
    runner.run(dataset, model_name="bench", run_id="timed")
    dt = time.perf_counter() - t0
    crops = n_imgs * n_inst
    cps = crops / dt
    print(f"[e2e] {model}: {crops} crops over {n_imgs} images in {dt:.2f} s "
          f"-> {cps:.1f} crops/s wall-clock (onboard 2x162 views: "
          f"{t_onb:.1f} s)", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "metric": (
                    f"END-TO-END test.py wall-clock ({model}, {n_imgs} "
                    f"images x {n_inst} dets, incl. host decode/crop/csv) "
                    "[vs_baseline = x54 crops/s yardstick]"
                ),
                "value": round(cps, 2),
                "unit": "crops/s",
                "vs_baseline": round(cps / 54.0, 2),
            }
        ),
        flush=True,
    )


def bench_coarse(model: str, watchdog=None):
    import jax

    # measured batch sweet spots (ROUND_NOTES r2/r3): the int8 serving
    # path amortizes at 2x the bf16 flax path's best batch
    quant = os.environ.get("GIGAPOSE_BENCH_QUANT", "0") == "1"
    if "vits" in model:
        default_b = "64" if quant else "32"
    else:
        default_b = "32" if quant else "16"
    B = int(os.environ.get("GIGAPOSE_BENCH_BATCH", default_b))
    iters = int(os.environ.get("GIGAPOSE_BENCH_ITERS", "20"))

    from __graft_entry__ import _coarse_setup

    use_pallas = os.environ.get("GIGAPOSE_BENCH_PALLAS", "0") == "1"
    fn, (ae_params, ist_vars, store, batch) = _coarse_setup(
        model, B=B, V=162, npat=16, img=224, use_pallas=use_pallas
    )
    jfn = jax.jit(fn)

    out = jfn(ae_params, ist_vars, store, batch)
    _ = np.asarray(out.poses)  # compile + warmup; host fetch forces completion
    if watchdog is not None:
        watchdog.pet()  # compile done = progress; re-arm for the measurement

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
        ),
        flush=True,
    )


def main():
    forced_model = os.environ.get("GIGAPOSE_BENCH_MODEL")
    mode = os.environ.get("GIGAPOSE_BENCH_MODE", "coarse")
    watchdog = _arm_watchdog(f"bench mode={mode}")

    import jax

    cache_dir = os.environ.get("GIGAPOSE_COMPILE_CACHE", "/tmp/gigapose_jax_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # A plain `python bench.py` measures the SHIPPING configuration: on TPU
    # that is Pallas fused matching + bf16 template store + bf16 ViT matmuls
    # (the defaults test.py resolves from the model configs; each justified by
    # the BENCH sweeps in ROUND_NOTES.md). Set the env knobs to 0 to measure
    # the XLA/f32 fallbacks.
    try:
        # first backend touch: if the axon relay is wedged this raises
        # RuntimeError(UNAVAILABLE) — emit a parseable sentinel line instead
        # of the BENCH_r03-style traceback so the driver artifact stays valid
        on_tpu = jax.default_backend() == "tpu"
    except Exception as exc:
        print(
            json.dumps(
                {
                    "metric": (
                        f"bench mode={mode} [ERROR: backend unavailable: "
                        f"{type(exc).__name__}]"
                    ),
                    "value": 0.0,
                    "unit": "crops/s",
                    "vs_baseline": 0.0,
                    "error": "tpu_unavailable",
                }
            ),
            flush=True,
        )
        watchdog.cancel()
        return
    if on_tpu:
        os.environ.setdefault("GIGAPOSE_BENCH_PALLAS", "1")
        os.environ.setdefault("GIGAPOSE_BENCH_BF16", "1")
        os.environ.setdefault("GIGAPOSE_BENCH_VIT_BF16", "1")
        # int8 W8A8 serving path for the AE backbone (the test.py
        # serving_quant=auto default on TPU); GIGAPOSE_BENCH_QUANT=0
        # measures the bf16 flax forward instead
        os.environ.setdefault("GIGAPOSE_BENCH_QUANT", "1")

    if mode == "onboarding":
        bench_onboarding(forced_model or "dinov2_vits14")
    elif mode == "refine":
        bench_refine()
    elif mode == "stages":
        for model in [forced_model] if forced_model else [
            "dinov2_vits14", "dinov2_vitl14",
        ]:
            bench_stages(model)
            watchdog.pet()
    elif mode == "istq":
        bench_istq()
    elif mode == "sharded":
        bench_sharded(forced_model or "dinov2_vitl14")
    elif mode == "e2e":
        bench_e2e(forced_model or "dinov2_vitl14")
    elif mode == "train":
        for model in [forced_model] if forced_model else [
            "dinov2_vits14", "dinov2_vitl14",
        ]:
            bench_train(model)
            watchdog.pet()
    else:
        # ViT-L (the reference default) last -> it is the driver headline
        for model in [forced_model] if forced_model else [
            "dinov2_vits14", "dinov2_vitl14",
        ]:
            bench_coarse(model, watchdog=watchdog)
            watchdog.pet()
    watchdog.cancel()


if __name__ == "__main__":
    main()
