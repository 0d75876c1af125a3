"""Logging helpers (ref: src/utils/logging.py)."""

from __future__ import annotations

import logging
import sys

_CONFIGURED = False


def get_logger(name: str) -> logging.Logger:
    """Module logger propagating to a once-configured root stderr handler."""
    global _CONFIGURED
    if not _CONFIGURED:
        root = logging.getLogger()
        if not root.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(
                logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
            )
            root.addHandler(h)
            root.setLevel(logging.INFO)
        _CONFIGURED = True
    return logging.getLogger(name)
