"""Inference CLI — mirrors cli_tool/activation_energy_predictor.py:15-154.

Given a SMILES csv and a 3D-coordinates xyz file, extracts MACE descriptors
(host-side, via data/descriptors.py), runs batched inference (the reference
loops reaction-by-reaction, aep.py:71-80) and renders/persists the
activation-energy table."""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def activation_energy_prediction(
        input_smiles: str, input_coordinates: str = "",
        output_results: str = "", model_path: str = "",
        print_results: bool = False, store_results: bool = False,
        output_format: str = "text", npz_path: str | None = None) -> list:
    from ..data import ChemDataset, plan_spec
    from ..train import load_model, predict
    from ..utils import AsciiTable

    data_path_smiles = Path(input_smiles)
    data_path_results = (Path(output_results) if output_results
                         else Path("results.txt"))
    if data_path_results.is_dir():
        data_path_results /= "results.txt"
    if not data_path_smiles.is_file():
        raise FileNotFoundError(f"SMILES file not found: {data_path_smiles}")

    if npz_path is None:
        data_path_coordinates = Path(input_coordinates)
        if not data_path_coordinates.is_file():
            raise FileNotFoundError(
                f"3D coordinates file not found: {data_path_coordinates}")
        npz = data_path_coordinates.parent / (data_path_coordinates.stem
                                              + ".npz")
        from ..data.descriptors import process_xyz_to_npz
        process_xyz_to_npz(data_path_smiles, data_path_coordinates, npz)
        npz_path = str(npz)

    pred_data = ChemDataset(str(data_path_smiles), data_npz_path=npz_path)
    params, cfg, _ = load_model(model_path)
    if pred_data.num_node_features != cfg.num_node_features:
        raise ValueError(
            f"model expects {cfg.num_node_features} node features but the "
            f"input provides {pred_data.num_node_features} — a CGR-MPNN-3D "
            "model needs matching MACE descriptors (--data_path_npz / "
            "--data_path_coordinates)")
    pred_data.prefeaturize()
    graphs = [pred_data.graph(i) for i in range(len(pred_data))]
    spec = plan_spec(graphs)
    preds = predict(params, cfg, pred_data, spec)

    table = AsciiTable(["Reaction ID", "Activation Energy [kcal/mol]"])
    results = []
    for i, ea in enumerate(preds):
        results.append({"Reaction_ID": i + 1, "Activation Energy": float(ea)})
        table.add_row([i + 1, f"{float(ea):.3f}"])

    if print_results:
        print("\nPredicted Activation Energies:\n")
        print(table)

    if store_results:
        if output_format == "text":
            with open(data_path_results, "w") as f:
                f.write("Predicted Activation Energies:\n\n")
                f.write(str(table))
        elif output_format == "json":
            with open(data_path_results.with_suffix(".json"), "w") as f:
                json.dump(results, f, indent=4)
        else:
            raise ValueError("Unsupported output format. Use 'text' or 'json'.")
        print(f"\nResults saved to: {data_path_results}")
    return results


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="Predict activation energies of chemical reactions via "
                    "the CGR MPNN 3D GNN (TPU-native).")
    ap.add_argument("--data_path_smiles", default="examples/demo.csv")
    ap.add_argument("--data_path_coordinates", default="examples/demo.xyz")
    ap.add_argument("--data_path_model",
                    default="saved_models/CGR-MPNN-3D.npz")
    ap.add_argument("--data_path_results", default="results.txt")
    ap.add_argument("--data_path_npz", default=None,
                    help="precomputed descriptor npz (skips MACE)")
    ap.add_argument("--store_results", action="store_true")
    ap.add_argument("--print_results", action="store_true")
    ap.add_argument("--output_format", default="text",
                    choices=["text", "json"])
    args = ap.parse_args(argv)

    activation_energy_prediction(
        args.data_path_smiles, args.data_path_coordinates,
        args.data_path_results, args.data_path_model, args.print_results,
        args.store_results, args.output_format, args.data_path_npz)


if __name__ == "__main__":
    main()
