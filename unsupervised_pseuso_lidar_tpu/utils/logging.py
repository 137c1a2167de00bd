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
