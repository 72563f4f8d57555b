"""Evaluation driver: test-set RMSE + predictions (+ parity plot).

Equivalent of test.py:41-153 — loads a checkpoint (npz + JSON sidecar
instead of a pickled module), runs batched inference (the reference defaults
to batch_size=1, test.py:85-90; we batch properly), computes
RMSE = sqrt(sum_sse / n) and optionally renders the predicted-vs-true
scatter plot."""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from ..data.batch import PackSpec
from ..data.dataset import ChemDataset
from ..data.loader import PackedLoader
from ..models.cgr_mpnn import CGRMPNNConfig, apply, init_params
from .checkpoint import load_checkpoint, restore_into

__all__ = ["load_model", "evaluate", "predict"]


def load_model(ckpt_path: str | Path) -> tuple[dict, CGRMPNNConfig, dict]:
    """Rebuild (params, config) from a checkpoint's npz + sidecar."""
    leaves, meta = load_checkpoint(ckpt_path)
    mcfg = meta["model"]
    cfg = CGRMPNNConfig(
        num_node_features=int(mcfg["num_node_features"]),
        num_edge_features=int(mcfg["num_edge_features"]),
        depth=int(mcfg["depth"]),
        hidden_sizes=tuple(mcfg["hidden_sizes"]),
        dropout_ps=tuple(mcfg["dropout_ps"]),
        activation=mcfg.get("activation", "ReLU"),
        aggr=mcfg.get("aggr", "add"),
        pooling=mcfg.get("pooling", "add"),
        use_learnable_skip=bool(mcfg.get("use_learnable_skip", False)),
    )
    params_template = init_params(jax.random.PRNGKey(0), cfg)
    n_params = len(jax.tree_util.tree_leaves(params_template))
    params = restore_into(params_template, leaves[:n_params])
    return params, cfg, meta


def predict(params: dict, cfg: CGRMPNNConfig, dataset: ChemDataset,
            spec: PackSpec, batch_size: int = 64) -> np.ndarray:
    """Predictions for every dataset row, in row order."""
    from ..utils.platform import maybe_enable_pallas
    cfg = maybe_enable_pallas(cfg)
    loader = PackedLoader(dataset, spec, batch_size=batch_size, shuffle=False)
    run_spec = loader.spec
    step = jax.jit(lambda p, b: apply(p, b, cfg, run_spec))
    rows, preds = [], []
    for batch in loader:
        out = np.asarray(step(params, batch))
        mask = np.asarray(batch.graph_mask) > 0
        preds.append(out[mask])
        rows.append(np.asarray(batch.row_ids)[mask])
    preds = np.concatenate(preds)
    rows = np.concatenate(rows)
    # slot order != input order (first-fit backfill); restore row order
    out = np.empty_like(preds)
    out[rows] = preds
    return out


def evaluate(params: dict, cfg: CGRMPNNConfig, dataset: ChemDataset,
             spec: PackSpec, batch_size: int = 64,
             plot_path: str | None = None) -> dict:
    preds = predict(params, cfg, dataset, spec, batch_size)
    true = dataset.labels[:len(preds)]
    rmse = float(np.sqrt(np.mean((preds - true) ** 2)))
    mae = float(np.mean(np.abs(preds - true)))
    print(f"Test loss: {rmse:.4f}\n")
    if plot_path:
        parity_plot(true, preds, plot_path)
    return {"test_losses": rmse, "test_mae": mae,
            "predictions": preds, "true_values": true}


def parity_plot(true: np.ndarray, preds: np.ndarray, path: str) -> None:
    """Predicted-vs-true scatter (test.py:127-149), host-side matplotlib."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("[evaluate] matplotlib unavailable; skipping parity plot")
        return
    fig, ax = plt.subplots(figsize=(10, 8))
    ax.scatter(true, preds, alpha=0.7, label="Predictions")
    lo, hi = float(np.min(true)), float(np.max(true))
    ax.plot([lo, hi], [lo, hi], color="red", linestyle="--",
            label="Identity Line")
    ax.set_xlabel("True Activation Energies [kcal/mol]", fontsize=16)
    ax.set_ylabel("Predicted Activation Energies [kcal/mol]", fontsize=16)
    ax.legend(fontsize=12, frameon=False)
    ax.grid(True, linestyle=":", linewidth=0.7, color="gray")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    print(f"Parity plot saved to {path}")
