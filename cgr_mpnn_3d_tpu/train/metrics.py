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
        logged explicitly by the trainer instead of via hooks; histograms
        via :meth:`log_histograms` (trainer --log_histograms)."""

    def log_histograms(self, tag: str, tree, epoch: int,
                       bins: int = 24) -> None:
        """wandb ``watch(log='all')`` equivalent (wandb_logger.py:41-49):
        per-layer downsampled histograms of a pytree (params or grads),
        one JSONL record per epoch with {leaf path: {counts, lo, hi}};
        mirrored to wandb as native Histogram objects when attached.
        Frequency is per-EPOCH, not the reference's log_freq=1 every-step
        firehose (which at 1400 steps/s would swamp the host)."""
        import numpy as np
        import jax

        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        hists = {}
        wandb_hists = {}
        for path, leaf in flat:
            name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                            for k in path)
            a = np.asarray(leaf, np.float32).ravel()
            if a.size == 0:
                continue
            # non-finite entries would make np.histogram raise (nan
            # range) and kill the run at epoch end — exactly the
            # transient the trainer's NaN guard is built to survive.
            # Histogram the finite part, COUNT the rest.
            finite = a[np.isfinite(a)]
            rec = {"nonfinite": int(a.size - finite.size)}
            if finite.size:
                counts, edges = np.histogram(finite, bins=bins)
                rec.update(counts=counts.tolist(),
                           lo=float(edges[0]), hi=float(edges[-1]))
                if self._wandb is not None:
                    wandb_hists[f"{tag}/{name}"] = self._wandb.Histogram(
                        np_histogram=(counts, edges))
            else:
                rec.update(counts=[], lo=0.0, hi=0.0)
            hists[name] = rec
        self._emit({"event": f"histograms/{tag}", "epoch": epoch,
                    "bins": bins, "hist": hists})
        if self._wandb is not None:
            self._wandb.log(wandb_hists, commit=False)

    def finish(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
