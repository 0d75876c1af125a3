"""Native evaluation stack (the reference's vestigial MegaPose eval stack,
src/megapose/evaluation/: meters, BOP scoring, result conversion — rebuilt as
a self-contained scorer so AR can be computed without the external
bop_toolkit; see SURVEY §2.6)."""

from gigapose_tpu.eval.errors import (  # noqa: F401
    add_error,
    adds_error,
    auc_posecnn,
    mspd_error,
    mssd_error,
    vsd_error,
)
from gigapose_tpu.eval.scorer import score_bop  # noqa: F401
