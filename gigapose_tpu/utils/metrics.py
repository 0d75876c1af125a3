"""Metrics sinks: JSONL always, TensorBoard and wandb when available.

Replaces the reference's dual wandb/tensorboard logger selection
(src/utils/logging.py:78-89, train.py:27-37): scalars stream to
<log_dir>/metrics.jsonl (greppable, dependency-free) and, when tensorboard is
importable, to TB event files; images save as PNGs under <log_dir>/vis and
are logged to TB when present. A wandb sink activates when the package is
importable AND `use_wandb=True` (the package is not in this image — the JSONL
stream is the machine-readable superset either way).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Dict, Optional

from gigapose_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class MetricsLogger:
    def __init__(
        self,
        log_dir: str,
        use_tensorboard: bool = True,
        use_wandb: bool = False,
        wandb_project: str = "gigapose_tpu",
        wandb_run_name: Optional[str] = None,
    ):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        os.makedirs(osp.join(log_dir, "vis"), exist_ok=True)
        self._jsonl = open(osp.join(log_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            # reference: WandbLogger selected by Hydra target sniffing
            # (train.py:27-37); here by flag + importability
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project, name=wandb_run_name, dir=log_dir,
                    resume="allow",
                )
            except Exception as e:  # package absent / no network
                logger.info(f"wandb sink disabled ({e})")
                self._wandb = None
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=osp.join(log_dir, "tb"))
            except Exception:
                try:
                    import tensorflow as tf

                    self._tb = tf.summary.create_file_writer(osp.join(log_dir, "tb"))
                    self._tb_is_tf = True
                except Exception:
                    self._tb = None
        self._tb_is_tf = getattr(self, "_tb_is_tf", False)

    def log_scalars(self, step: int, scalars: Dict[str, float]):
        rec = {"step": step, "time": time.time(), **scalars}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
        if self._tb is not None:
            if self._tb_is_tf:
                import tensorflow as tf

                with self._tb.as_default():
                    for k, v in scalars.items():
                        tf.summary.scalar(k, v, step=step)
            else:
                for k, v in scalars.items():
                    self._tb.add_scalar(k, v, step)

    def log_image(self, step: int, name: str, image):
        """image: PIL Image."""
        path = osp.join(self.log_dir, "vis", f"{name.replace('/', '_')}_{step:08d}.png")
        image.save(path)
        if self._wandb is not None:
            import wandb

            self._wandb.log({name: wandb.Image(image)}, step=step)
        return path

    def close(self):
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None and not self._tb_is_tf:
            self._tb.close()
