"""Experiment tracking: std logging, JSONL metrics, optional wandb.

Counterpart of the reference's logging/observability surface
(/root/reference/train_unet.py:43-48, 111-142, 381-388): per-step train_loss+lr,
eval_loss, sampled/recon image logging, param counts. wandb is optional exactly
like the reference (ImportError with instructions when requested but absent,
train_unet.py:117-122); a JSONL file tracker always records metrics so offline
runs keep full observability.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional


def get_logger(name: str) -> logging.Logger:
    # force=True: the TPU plugin's sitecustomize installs a WARNING-level root
    # handler at interpreter start, which would silently swallow INFO logs
    logging.basicConfig(
        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S",
        level=logging.INFO,
        force=True,
    )
    logging.getLogger("absl").setLevel(logging.WARNING)  # orbax save chatter
    return logging.getLogger(name)


class NullTracker:
    """No-op sink for non-main processes in multi-host runs (the reference logs
    on the main rank only, train_unet.py:111-142)."""

    def set_persistent(self, **fields) -> None:
        pass

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        pass

    def log_images(self, images: Dict[str, Any], step: int) -> None:
        pass

    def finish(self) -> None:
        pass


class Tracker:
    """Metrics sink: JSONL always; wandb when with_tracking and available."""

    def __init__(self, log_cfg, run_name: str, config: Optional[Dict] = None):
        self.log_cfg = log_cfg
        self.wandb = None
        self._persistent: Dict[str, Any] = {}
        os.makedirs(log_cfg.logging_dir, exist_ok=True)
        self.jsonl_path = os.path.join(
            log_cfg.logging_dir, f"{run_name}_metrics.jsonl"
        )
        self._jsonl = open(self.jsonl_path, "a")

        if log_cfg.with_tracking:
            if log_cfg.report_to != "wandb":
                raise NotImplementedError(
                    "Currently only support wandb; add an init for your platform"
                )
            try:
                import wandb

                wandb.init(
                    project="stable_diffusion_pytorch_tpu",
                    name=f"run_{time.strftime('%Y-%m-%d_%H:%M:%S')}",
                    group=run_name,
                    resume=log_cfg.resume,
                    config=config or {},
                )
                self.wandb = wandb
            except ImportError as e:
                raise ImportError(
                    "You passed with_tracking and report_to `wandb`; wandb is not "
                    "installed in this environment (`pip install wandb`)"
                ) from e

    def set_persistent(self, **fields) -> None:
        """Fields stamped onto every subsequent metrics record (e.g.
        synthetic_fallback=True so degraded runs are auditable)."""
        self._persistent.update(fields)

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        record = {"step": step, "time": time.time(), **self._persistent}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)

    def log_images(self, images: Dict[str, Any], step: int) -> None:
        """images: name -> HWC uint8 array (or list of them)."""
        if self.wandb is not None:
            payload = {
                k: [self.wandb.Image(img) for img in (v if isinstance(v, list) else [v])]
                for k, v in images.items()
            }
            self.wandb.log(payload, step=step)

    def finish(self) -> None:
        self._jsonl.close()
        if self.wandb is not None:
            self.wandb.finish()
