"""Full-system accuracy check: train tiny nets on the synthetic fixture, then
the coarse pipeline must recover a metrically correct pose on the held-out
test image (see gigapose_tpu/scripts/selfcheck_e2e.py). Marked slow: ~8 min
on the 1-core CI box; run explicitly with `-m slow`."""

import pytest


@pytest.mark.slow
def test_train_then_estimate_pose(tmp_path):
    from gigapose_tpu.scripts.selfcheck_e2e import main

    result = main([f"root={tmp_path}", "steps=120"])
    # observed after 120 steps: t_err ~21 mm (5% of 400 mm depth), rot ~0.9 deg
    assert result["t_err_mm"] < 60, result
    assert result["rot_err_deg"] < 10, result
    assert result["score"] > 0.5, result
