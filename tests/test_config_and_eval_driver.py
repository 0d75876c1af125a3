"""Config system behaviors + the eval_bop driver on the synthetic fixture."""

import os

import pytest

from gigapose_tpu.utils.config import load_config
from tests import synthetic_bop


def test_nested_overrides_and_types():
    cfg = load_config(
        "test",
        [
            "machine.root_dir=/x",
            "model.testing_metric.k=3",
            "max_num_dets_per_forward=8",
            "use_multiple=false",
            "run_id=abc",
        ],
    )
    assert cfg.machine.root_dir == "/x"
    assert cfg.model.testing_metric.k == 3 and isinstance(cfg.model.testing_metric.k, int)
    assert cfg.max_num_dets_per_forward == 8
    assert cfg.use_multiple is False
    assert cfg.run_id == "abc"


def test_train_config_groups():
    cfg = load_config("train", ["machine.batch_size=4"])
    assert cfg.machine.batch_size == 4
    assert cfg.model.optim.warm_up_steps == 200
    assert cfg.seed == 2023


def test_eval_bop_driver(tmp_path, monkeypatch, capsys):
    root = synthetic_bop.build(str(tmp_path))
    monkeypatch.setenv("GIGAPOSE_TINY", "1")
    from gigapose_tpu.scripts.eval_bop import main

    main(
        [
            f"machine.root_dir={root}",
            "datasets=tudl",
            "run_id=driver",
            "refine=false",
            "data.template.num_templates=8",
        ]
    )
    out = capsys.readouterr().out
    assert "csv_written" in out
    pred = os.path.join(root, "results", "large_driver", "predictions",
                        "large-pbrreal-rgb-mmodel_tudl-test_driver.csv")
    assert os.path.exists(pred)
