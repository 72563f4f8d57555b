"""Learning-capability test: the model must actually learn chemistry-shaped
structure, not just memorize the 10-row demo set.

Generates a few hundred synthetic bond-breaking reactions (atom-mapped
chains with 0-2 bonds removed) whose activation-energy label is a
deterministic function of the structural change; a small CGR model must
drive held-out RMSE well below the label standard deviation."""

import numpy as np
import pytest

from cgr_mpnn_3d_tpu.chem import RxnGraph
from cgr_mpnn_3d_tpu.data import ChemDataset, plan_spec
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig
from cgr_mpnn_3d_tpu.train import RxnGraphTrainer, evaluate, load_model


def _chain_smiles(n: int, broken: set[int]) -> str:
    """Atom-mapped carbon chain; product removes the bonds in ``broken``
    (radical fragments — featurization is valence-lenient)."""
    def atoms(bonds_present):
        parts = []
        for i in range(n):
            parts.append(f"[CH2:{i + 1}]")
        # build SMILES with explicit fragments
        frags = []
        cur = [0]
        for i in range(1, n):
            if (i - 1) in bonds_present:
                cur.append(i)
            else:
                frags.append(cur)
                cur = [i]
        frags.append(cur)
        return ".".join("".join(parts[j] for j in frag) for frag in frags)

    all_bonds = set(range(n - 1))
    reac = atoms(all_bonds)
    prod = atoms(all_bonds - broken)
    return f"{reac}>>{prod}"


def _make_dataset(path, n_rows: int, seed: int):
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n_rows):
        n = int(rng.integers(5, 13))
        k = int(rng.integers(0, 3))
        broken = set(rng.choice(n - 1, size=k, replace=False).tolist())
        smi = _chain_smiles(n, broken)
        label = 4.0 * k + 0.1 * n
        rows.append((smi, label))
    with open(path, "w") as f:
        f.write("smiles,ea\n")
        for s, y in rows:
            f.write(f"{s},{y}\n")
    return rows


@pytest.mark.slow
def test_model_learns_bond_breaking(tmp_path):
    train_csv = tmp_path / "train.csv"
    val_csv = tmp_path / "val.csv"
    _make_dataset(train_csv, 256, seed=0)
    val_rows = _make_dataset(val_csv, 64, seed=1)

    train_ds = ChemDataset(str(train_csv))
    val_ds = ChemDataset(str(val_csv))
    train_ds.prefeaturize()
    graphs = [train_ds.graph(i) for i in range(len(train_ds))]
    spec = plan_spec(graphs, te=128, tn=64, tb=8)

    cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                        depth=2, hidden_sizes=(48, 48),
                        dropout_ps=(0.0, 0.0))
    tr = RxnGraphTrainer(
        name="learncheck", cfg=cfg, train_data=train_ds, val_data=val_ds,
        spec=spec, lr=3e-3, num_epochs=25, batch_size=32, val_frequency=5,
        model_save_dir=str(tmp_path / "m"), seed=0)
    out = tr.train()

    labels = np.asarray([y for _, y in val_rows])
    label_std = labels.std()
    best_val = min(out["val_losses"])
    # must beat predicting-the-mean by a wide margin
    assert best_val < 0.35 * label_std, (best_val, label_std)


@pytest.mark.slow
def test_3d_descriptor_fusion_helps(tmp_path):
    """Labels depend on a per-atom descriptor sum that is invisible to the
    2D CGR features; the CGR-MPNN-3D model (npz fusion) must fit it, the
    2D-only model must not."""
    rng = np.random.default_rng(0)
    rows, descs = [], []
    for _ in range(192):
        n = int(rng.integers(5, 11))
        smi = _chain_smiles(n, set())
        d = rng.standard_normal((n, 6)).astype(np.float32)
        label = float(2.0 * d[:, 0].sum())      # only visible in descriptors
        rows.append((smi, label))
        descs.append(d)
    csv = tmp_path / "t.csv"
    with open(csv, "w") as f:
        f.write("smiles,ea\n")
        for s, y in rows:
            f.write(f"{s},{y}\n")
    npz = tmp_path / "t.npz"
    np.savez(str(npz), *descs)

    def run(with_npz: bool) -> float:
        ds = ChemDataset(str(csv),
                         data_npz_path=str(npz) if with_npz else None)
        ds.prefeaturize()
        graphs = [ds.graph(i) for i in range(len(ds))]
        spec = plan_spec(graphs, te=128, tn=64, tb=8)
        cfg = CGRMPNNConfig(num_node_features=ds.num_node_features,
                            num_edge_features=14, depth=2,
                            hidden_sizes=(32, 32), dropout_ps=(0.0, 0.0))
        tr = RxnGraphTrainer(
            name=f"fuse{with_npz}", cfg=cfg, train_data=ds, val_data=ds,
            spec=spec, lr=3e-3, num_epochs=20, batch_size=32,
            val_frequency=5, model_save_dir=str(tmp_path / "m"), seed=0)
        out = tr.train()
        return min(out["val_losses"])

    rmse_3d = run(True)
    rmse_2d = run(False)
    label_std = np.asarray([y for _, y in rows]).std()
    assert rmse_3d < 0.4 * label_std, (rmse_3d, label_std)
    assert rmse_3d < 0.5 * rmse_2d, (rmse_3d, rmse_2d)
