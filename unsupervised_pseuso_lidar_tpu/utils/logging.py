"""Metric logging: stdout always, wandb behind the MLOps flag.

Parity: /root/reference/trainer.py:118-127,272-275,331-332 (wandb init /
watch / per-step loss / per-epoch metrics behind config action.MLOps).
wandb is optional — gated import, graceful no-op when absent.
"""

from __future__ import annotations

import json
import time
from typing import Dict, Optional


class MetricLogger:
    """Callable(metrics: dict, step: int) logger."""

    def __init__(self, config=None, project: str = "unsup-depth-estimation"):
        self._wandb = None
        self._start = time.time()
        mlops = bool(config and config.action.mlops)
        if mlops:
            try:
                import wandb

                wandb.init(project=project,
                           config=config.to_dict() if config else None)
                self._wandb = wandb
            except Exception as exc:  # wandb absent or offline
                print(f"[logging] wandb unavailable ({exc}); stdout only")

    def __call__(self, metrics: Dict[str, float], step: int) -> None:
        record = {"step": step, "t": round(time.time() - self._start, 1)}
        record.update({k: round(float(v), 6) for k, v in metrics.items()})
        print(json.dumps(record), flush=True)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_images(self, images: Dict[str, str], step: int) -> None:
        """Log rendered images (name -> PNG path or HWC array).

        Parity: log_depth_predictions / the predictions wandb.Table
        (/root/reference/trainer.py:118-127,204-212). No-op without wandb."""
        if self._wandb is None:
            return
        self._wandb.log(
            {name: self._wandb.Image(img) for name, img in images.items()},
            step=step,
        )

    def log_param_histograms(self, params, step: int) -> None:
        """Per-layer weight histograms — the flax analog of
        wandb.watch(depth_model) (/root/reference/trainer.py:121, which is
        torch-module-specific). No-op without wandb."""
        if self._wandb is None:
            return
        import jax
        import numpy as np

        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        hists = {
            "params/" + "/".join(str(getattr(k, "key", k)) for k in path):
                self._wandb.Histogram(np.asarray(leaf).ravel())
            for path, leaf in flat
        }
        self._wandb.log(hists, step=step)
