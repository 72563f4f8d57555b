"""Test/eval CLI — mirrors the reference's test.py:41-196.

Loads an npz checkpoint (model config from the JSON sidecar), evaluates the
test split with proper batching (the reference defaults to batch_size=1,
test.py:85-90), prints RMSE, optionally saves the parity plot and merges
results into the hyperparameter-study JSON."""

from __future__ import annotations

import argparse
import os
from pathlib import Path


def test(name: str, path_trained_model: str, data_path: str = "datasets",
         plot_results: bool = True,
         save_plot: str = "predicted_vs_true_activation_energy.pdf",
         batch_size: int = 64) -> dict:
    from ..data import ChemDataset, plan_spec
    from ..train import evaluate, load_model

    test_csv = Path(data_path) / "test.csv"
    if not test_csv.exists():
        from ..data.preprocess import PreProcessTransition1x
        PreProcessTransition1x(
            fpath_processed=str(data_path)).start_data_acquisition(["test"])

    if name == "CGR":
        test_data = ChemDataset(str(test_csv))
    elif name == "CGR-MPNN-3D":
        test_data = ChemDataset(str(test_csv),
                                data_npz_path=str(Path(data_path) / "test.npz"))
    else:
        raise NameError(f"Unknown model with name '{name}'.")

    params, cfg, _meta = load_model(path_trained_model)
    test_data.prefeaturize()
    graphs = [test_data.graph(i) for i in range(len(test_data))]
    spec = plan_spec(graphs)

    res = evaluate(params, cfg, test_data, spec, batch_size=batch_size,
                   plot_path=save_plot if (plot_results or save_plot) else None)
    return {"test_losses": res["test_losses"], "test_mae": res["test_mae"]}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="CLI tool for testing the CGR MPNN 3D GNN (TPU-native).")
    ap.add_argument("--path_trained_model", required=True)
    ap.add_argument("--data_path", default="datasets")
    ap.add_argument("--save_plot", default="")
    ap.add_argument("--plot_results", action="store_true")
    ap.add_argument("--save_result", action="store_true")
    ap.add_argument("--batch_size", default=64, type=int)
    args = ap.parse_args(argv)

    # model name inferred from checkpoint basename (test.py:185)
    name = os.path.basename(args.path_trained_model).split("_")[0]
    if not Path(args.path_trained_model).exists():
        raise NameError(
            f"Invalid model data location at {args.path_trained_model}")

    out = test(name, args.path_trained_model, args.data_path,
               args.plot_results, args.save_plot, args.batch_size)

    if args.save_result:
        from ..utils import json_dumper
        d = Path("hyperparameter_study")
        d.mkdir(parents=True, exist_ok=True)
        json_dumper(str(d / f"{name}_hyperparameter_study.json"), out,
                    args.path_trained_model)


if __name__ == "__main__":
    main()
