"""MACE 3D descriptor extraction (reference C12,
download_preprocess_datasets.py:103-142).

MACE is a frozen *external* featurizer run once offline on the host — the TPU
framework consumes its npz output (SURVEY.md §2 C12).  This module provides:

* :func:`process_xyz_to_npz` — the reference pipeline: iterate xyz structures
  (reactant/TS/product triplets per reaction), compute per-atom descriptors,
  reorder rows into SMILES atom-map order, concatenate [r||ts||p] and save
  ``arr_0..arr_{n-1}``.  Requires the optional ``mace-torch`` + ``ase``
  packages; raises a clear error when absent (they are not part of this
  image).
* :func:`synthetic_descriptors_npz` — a deterministic stand-in with the same
  npz contract (used by tests and demos, mirroring the reference's own test
  strategy of faking MACE features, test_chemdataset.py:36-40).
* :func:`read_xyz` / atom-map reordering helpers — pure, tested host code.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..chem.mol import mol_from_smiles

__all__ = ["read_xyz", "atom_map_order", "process_xyz_to_npz",
           "synthetic_descriptors_npz"]


def read_xyz(path: str | Path) -> list[tuple[list[str], np.ndarray]]:
    """Parse a (multi-structure) xyz file -> [(symbols, positions[N,3])]."""
    structures = []
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        if not lines[i].strip():
            i += 1
            continue
        natoms = int(lines[i].split()[0])
        block = lines[i + 2: i + 2 + natoms]
        syms, pos = [], []
        for row in block:
            parts = row.split()
            syms.append(parts[0])
            pos.append([float(x) for x in parts[1:4]])
        structures.append((syms, np.asarray(pos, np.float64)))
        i += 2 + natoms
    return structures


def atom_map_order(reactant_smiles: str) -> np.ndarray:
    """Row-reorder indices: xyz rows are in atom-map order 1..N; graph rows
    follow SMILES order.  ``ridx[i] = map_num(atom_i) - 1`` mirrors
    download_preprocess_datasets.py:131-134."""
    mol = mol_from_smiles(reactant_smiles)
    ridx = np.asarray([a.map_num - 1 for a in mol.atoms], np.int64)
    if (ridx < 0).any():
        raise ValueError("reactant SMILES must be fully atom-mapped")
    return ridx


def _mace_descriptor_fn(model: str, device: str):
    """Default per-structure descriptor backend: the pretrained MACE-MP
    force field (frozen external featurizer, dpd.py:118-126)."""
    try:
        from ase import Atoms
        from mace.calculators import mace_mp
    except ImportError as e:
        raise ImportError(
            "MACE descriptor extraction needs the optional 'mace-torch' "
            "package (run offline on a host with it installed, or pass a "
            "precomputed npz via --data_path_npz / "
            "synthetic_descriptors_npz for testing)") from e
    calc = mace_mp(model=model, device=device)

    def fn(symbols: list[str], positions: np.ndarray) -> np.ndarray:
        return np.asarray(calc.get_descriptors(
            Atoms(symbols=symbols, positions=positions)))
    return fn


def process_xyz_to_npz(csv_file: str | Path, xyz_file: str | Path,
                       npz_file: str | Path, model: str = "small",
                       device: str = "cpu",
                       descriptor_fn=None) -> None:
    """Reference C12 pipeline (dpd.py:103-142): per-atom descriptors for
    each reaction's [reactant, transition-state, product] xyz triplet,
    reordered into SMILES atom-map order, concatenated [r||ts||p] along
    features, saved as arr_i per csv row.

    ``descriptor_fn(symbols, positions[N,3]) -> [N, D]`` defaults to the
    pretrained MACE-MP model; injecting it lets tests cover the whole
    pipeline (frame iteration, triplet indexing, atom-map reorder, concat,
    npz contract) without the heavyweight optional dependency."""
    import csv as _csv

    if descriptor_fn is None:
        descriptor_fn = _mace_descriptor_fn(model, device)
    descs = [np.asarray(descriptor_fn(syms, pos))
             for syms, pos in read_xyz(xyz_file)]

    with open(csv_file, newline="") as f:
        rows = _strip_header(list(_csv.reader(f)))
    if len(descs) != 3 * len(rows):
        raise ValueError(
            f"{xyz_file} holds {len(descs)} structures but {csv_file} has "
            f"{len(rows)} reactions — expected 3 (r/ts/p) per reaction")

    features = []
    for i, row in enumerate(rows):
        rsmi = row[0].split(">")[0]
        ridx = atom_map_order(rsmi)
        concat = [descs[3 * i][ridx, :], descs[3 * i + 1][ridx, :],
                  descs[3 * i + 2][ridx, :]]
        features.append(np.concatenate(concat, axis=1))
    np.savez(str(npz_file), *features)


def synthetic_descriptors_npz(csv_file: str | Path, npz_file: str | Path,
                              dim_per_structure: int = 64,
                              seed: int = 0) -> None:
    """Same npz contract as :func:`process_xyz_to_npz` with deterministic
    pseudo-descriptors (3*dim per atom) — the test/demo stand-in."""
    import csv as _csv
    with open(csv_file, newline="") as f:
        rows = _strip_header(list(_csv.reader(f)))
    rng = np.random.default_rng(seed)
    features = []
    for row in rows:
        rsmi = row[0].split(">")[0]
        n_atoms = mol_from_smiles(rsmi).num_atoms
        features.append(rng.standard_normal(
            (n_atoms, 3 * dim_per_structure)).astype(np.float32))
    np.savez(str(npz_file), *features)


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def _strip_header(rows: list[list[str]]) -> list[list[str]]:
    """Drop a header row.  Keyed on the label column parsing as a float
    (the same rule as data/dataset.py); single-column files fall back to a
    SMILES-shape heuristic."""
    if not rows:
        return rows
    first = rows[0]
    if len(first) > 1:
        return rows[1:] if not _is_float(first[1]) else rows
    return rows[1:] if not _looks_like_smiles(first[0]) else rows


def _looks_like_smiles(s: str) -> bool:
    return any(c in s for c in "[]>=#") or s.isalpha() and s[0].isupper()
