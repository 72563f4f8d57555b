"""Metrics logging: stdout + JSONL always; Weights & Biases when available.

Replaces the reference's hard wandb dependency (wandb_logger.py:5-71) with a
pluggable logger exposing the same surface (``log``/``watch``/``finish``).
JSONL is the source of truth (consumed by the local sweep evaluator,
cli/sweep.py); wandb is attached opportunistically.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

__all__ = ["MetricsLogger"]


class MetricsLogger:
    def __init__(self, run_name: str, log_dir: str | Path = "runs",
                 config: dict | None = None, use_wandb: bool = False,
                 stdout: bool = True):
        self.run_name = run_name
        self.stdout = stdout
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.log_dir / f"{run_name}.jsonl"
        self._f = open(self.path, "a")
        self._wandb = None
        if config:
            self._emit({"event": "config", **config})
        if use_wandb:
            try:
                import wandb  # noqa: deferred optional dependency
                self._wandb = wandb
                wandb.init(project="CGR-MPNN-3D-TPU", name=run_name,
                           config=config or {})
            except Exception as e:  # wandb missing or offline: degrade
                print(f"[metrics] wandb unavailable ({e}); using JSONL only")

    def _emit(self, rec: dict) -> None:
        rec = {"t": time.time(), **rec}
        self._f.write(json.dumps(rec, default=float) + "\n")
        self._f.flush()

    def log(self, log_dict: dict, commit: bool = True,
            step: int | None = None) -> None:
        rec = dict(log_dict)
        if step is not None:
            rec["step"] = step
        self._emit(rec)
        if self.stdout:
            kv = ", ".join(f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                           for k, v in rec.items() if k != "t")
            print(f"[{self.run_name}] {kv}")
        if self._wandb is not None:
            self._wandb.log(log_dict, commit=commit, step=step)

    def watch(self, *_args, **_kw) -> None:
        """Parameter/gradient watching (wandb_logger.py:41-49) — norms are
        logged explicitly by the trainer instead of via hooks."""

    def finish(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
