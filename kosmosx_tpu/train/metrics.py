"""Structured training metrics (SURVEY.md §5 observability row).

The reference logs a single loss scalar to wandb per step
(/root/reference/train.py:650) plus console prints every 100 steps
(:674-678). Here: pluggable writers (console, JSONL file, wandb-when-
importable) fed a full metric dict (loss, accuracy, perplexity, grad_norm,
lr, tokens/sec/chip, step time).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)


class MetricsLogger:
    def __init__(self, jsonl_path: Optional[str] = None,
                 use_wandb: bool = False, project: str = "kosmosx_tpu",
                 config: Optional[Dict[str, Any]] = None,
                 console: bool = True):
        self.console = console
        self._file = None
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
            self._file = open(jsonl_path, "a", buffering=1)
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=project, config=config or {})
            except Exception as e:
                logger.info("wandb unavailable (%s); skipping", type(e).__name__)
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        record = {"step": step, "time": round(time.time() - self._t0, 3)}
        record.update({k: (float(v) if hasattr(v, "item") or
                           isinstance(v, (int, float)) else v)
                       for k, v in metrics.items()})
        if self._file:
            self._file.write(json.dumps(record) + "\n")
        if self._wandb:
            self._wandb.log(record, step=step)
        if self.console:
            short = {k: round(v, 5) for k, v in record.items()
                     if isinstance(v, float)}
            logger.info("step %d %s", step, short)

    def __call__(self, step: int, metrics: Dict[str, Any]) -> None:
        self.log(step, metrics)

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._wandb:
            self._wandb.finish()
