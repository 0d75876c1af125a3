"""Full BOP benchmark driver (ref: src/scripts/eval_bop.py:16-136).

For each requested dataset: run the coarse test CLI, then refinement (top-1
and/or top-5), then score the produced csv — via the official bop_toolkit
eval_bop19_pose when installed (external, like the reference's os.system
call), else via the in-repo native BOP19 scorer (gigapose_tpu/eval/), which
recomputes VSD/MSSD/MSPD average recall without any external dependency.

Usage:
    python -m gigapose_tpu.scripts.eval_bop machine.root_dir=<root> \
        [datasets=lmo,tless,...] [run_id=0] [refine=true] [use_multiple=true]
"""

from __future__ import annotations

import json
import os
import os.path as osp
import subprocess
import sys

BOP23_CORE = ["lmo", "tless", "tudl", "icbin", "itodd", "hb", "ycbv"]


def run_dataset(ds: str, overrides, root: str, run_id, refine: bool,
                use_multiple: bool) -> dict:
    import test as test_cli

    base = [f"test_dataset_name={ds}", f"run_id={run_id}"] + overrides
    test_cli.main(list(base))
    if refine:
        import refine as refine_cli

        refine_cli.main(list(base) + [f"use_multiple={str(use_multiple).lower()}"])
    out = {"dataset": ds, "status": "csv_written"}
    # official AR scoring when bop_toolkit is installed (external, like the
    # reference's os.system call)
    kv = dict(o.split("=", 1) for o in base if "=" in o)
    results_root = osp.join(
        kv.get("machine.root_dir", "."), "results"
    )
    for sub in ("predictions_refined", "predictions"):
        pattern = osp.join(results_root, f"large_{run_id}", sub)
        if osp.isdir(pattern):
            csvs = [f for f in os.listdir(pattern)
                    if f.endswith(".csv") and "MultiHypothesis" not in f]
            if csvs:
                out[f"score_{sub}"] = score_csv(
                    osp.join(pattern, csvs[0]), root, ds
                )
                break
    return out


def score_csv(csv_path: str, root: str, dataset: str) -> dict:
    """bop_toolkit when installed; else the native in-repo BOP19 scorer."""
    out = score_with_bop_toolkit(csv_path)
    if out.get("bop19_average_recall") is not None:
        return out
    try:
        from gigapose_tpu.eval import score_bop

        return score_bop(csv_path, root, dataset)
    except Exception as e:  # scoring is best-effort; the csv is the artifact
        out["native_scorer_error"] = f"{type(e).__name__}: {e}"
        return out


def score_with_bop_toolkit(csv_path: str) -> dict:
    """Shell out to bop_toolkit's eval_bop19_pose (external dependency, like
    the reference's os.system call at eval_bop.py:29-41)."""
    try:
        import bop_toolkit_lib  # noqa: F401
    except ImportError:
        return {"bop19_average_recall": None, "note": "bop_toolkit not installed"}
    cmd = [
        sys.executable, "-m", "bop_toolkit_lib.scripts.eval_bop19_pose",
        "--renderer_type=vispy", f"--result_filenames={osp.basename(csv_path)}",
        f"--results_path={osp.dirname(csv_path)}",
        f"--eval_path={osp.dirname(csv_path)}",
    ]
    subprocess.run(cmd, check=False)
    scores_files = []
    for root_, _, files in os.walk(osp.dirname(csv_path)):
        scores_files += [osp.join(root_, f) for f in files if f == "scores_bop19.json"]
    if not scores_files:
        return {"bop19_average_recall": None}
    with open(sorted(scores_files)[-1]) as f:
        return json.load(f)


def main(argv=None):
    args = list(argv if argv is not None else sys.argv[1:])
    kv = dict(a.split("=", 1) for a in args)
    datasets = kv.pop("datasets", ",".join(BOP23_CORE)).split(",")
    run_id = kv.pop("run_id", "0")
    refine = kv.pop("refine", "true").lower() == "true"
    use_multiple = kv.pop("use_multiple", "true").lower() == "true"
    overrides = [f"{k}={v}" for k, v in kv.items()]

    results = {}
    for ds in datasets:
        print(f"=== {ds} ===")
        try:
            results[ds] = run_dataset(
                ds, overrides, kv.get("machine.root_dir", "."), run_id, refine,
                use_multiple,
            )
        except FileNotFoundError as e:
            results[ds] = {"dataset": ds, "status": f"missing data: {e}"}
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
