"""Static HTML dashboard (utils/dashboard.py — the bokeh Plotter rebuild)."""

import json
import os
import os.path as osp

import numpy as np

from gigapose_tpu.utils.dashboard import (
    build_dashboard,
    load_run_config,
    load_run_metrics,
    main,
)


def _make_run(root, name, lr, n=50, with_vis=True):
    d = osp.join(root, name)
    os.makedirs(osp.join(d, "vis"), exist_ok=True)
    rng = np.random.default_rng(hash(name) % 2**31)
    with open(osp.join(d, "metrics.jsonl"), "w") as f:
        for s in range(n):
            f.write(json.dumps({
                "step": s, "time": 1000.0 + s,
                "train/loss": float(2.0 * np.exp(-s / 20) + rng.normal(0, 0.02)),
                "train/lr": lr if s > 10 else lr * s / 10,
            }) + "\n")
        f.write(json.dumps({"step": n, "time": 2000.0,
                            "val/matching": 0.8}) + "\n")
        f.write('{"torn line')  # live-run torn tail must be skipped
    with open(osp.join(d, "config.json"), "w") as f:
        json.dump({"optim": {"lr": lr, "steps": n}, "model": "vit_tiny"}, f)
    if with_vis:
        from PIL import Image

        Image.fromarray(
            (rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8)
        ).save(osp.join(d, "vis", "kp.png"))
    return d


def test_load_and_build(tmp_path):
    root = str(tmp_path)
    d1 = _make_run(root, "run_a", 1e-3)
    d2 = _make_run(root, "run_b", 3e-4, with_vis=False)

    m = load_run_metrics(d1)
    assert set(m) == {"train/loss", "train/lr", "val/matching"}
    assert len(m["train/loss"]) == 50
    assert load_run_config(d1)["optim.lr"] == 1e-3

    out = osp.join(root, "dash.html")
    path = build_dashboard({"run_a": d1, "run_b": d2}, out)
    html_src = open(path).read()
    # one chart per metric, overlaying both runs
    assert html_src.count("<figure class=\"chart\"") == 3
    assert html_src.count("<path d=\"M") >= 4  # loss+lr have 2 series each
    # legend present for multi-series charts; series colors from fixed slots
    assert '<span class="legend-item">' in html_src
    assert "--s0: #2a78d6" in html_src
    # dark mode block
    assert "prefers-color-scheme: dark" in html_src
    # config diff contains only the differing key (lr), not the shared model
    assert "optim.lr" in html_src
    assert html_src.count("<tr><td>model</td>") == 0
    # vis gallery embedded as base64
    assert "data:image/png;base64," in html_src
    # table fallback + hover tooltip layer exist
    assert "<details>" in html_src and "mousemove" in html_src


def test_single_run_and_field_filter(tmp_path):
    root = str(tmp_path)
    d1 = _make_run(root, "solo", 1e-3, with_vis=False)
    out = osp.join(root, "dash.html")
    build_dashboard({"solo": d1}, out, fields=["train/loss"])
    html_src = open(out).read()
    assert html_src.count("<figure class=\"chart\"") == 1
    # single series: no legend box (title names it)
    assert '<span class="legend-item">' not in html_src
    # single run: config shown in full (not suppressed by the diff rule)
    assert "optim.lr" in html_src and "model" in html_src


def test_cli(tmp_path, capsys):
    root = str(tmp_path)
    d1 = _make_run(root, "r0", 1e-3, with_vis=False)
    out = osp.join(root, "cli.html")
    main([f"run_dirs={d1}", f"out={out}"])
    assert osp.exists(out)
    assert capsys.readouterr().out.strip() == out
