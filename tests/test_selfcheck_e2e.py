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


@pytest.mark.slow
def test_full_system_on_rendered_data(tmp_path):
    """Rendered 3D fixture: train coarse nets, estimate, train refiner,
    refine — errors must be in the regime observed in round-1 runs
    (coarse <= 40 mm / 30 deg at level 0 with tiny nets)."""
    from gigapose_tpu.scripts.selfcheck_full import main

    result = main([f"root={tmp_path}", "steps=400", "refiner_steps=200"])
    assert result["coarse_t_err_mm"] < 60, result
    assert result["coarse_rot_err_deg"] < 35, result
    assert result["refined_t_err_mm"] < 120, result  # smoke bound
