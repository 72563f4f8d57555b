"""Transition1x acquisition & preprocessing (reference C11,
download_preprocess_datasets.py:18-331).

Offline host-side pipeline: download the T1x h5 + wb97xd3 csv/tarball,
extract the 11,961 reaction folders, scrape Q-Chem ``.log`` files into
``.xyz``, iterate T1x records into per-split xyz/csv files (activation energy
= (E_TS - E_reactant) * 23.06 eV->kcal/mol, dpd.py:279-282), match each T1x
record back to its wb97xd3 reaction SMILES via the atomic-number-string +
closest-product-geometry heuristic (dpd.py:284-307), then run the MACE
descriptor step (data/descriptors.py).

Pure logic (log scraping, record matching, unit conversion) is importable and
tested without network access; the orchestration requires the optional
``transition1x``/``ase`` packages and network, and raises clear errors when
unavailable.  Improvement over the reference: the O(n^2) candidate scan is
memoized by atomic-number string (dpd.py:289-296 rescans every record).
"""

from __future__ import annotations

import os
import shutil
import urllib.request
from pathlib import Path

import numpy as np

__all__ = ["EV_TO_KCAL_PER_MOL", "process_log_to_xyz", "match_reaction",
           "PreProcessTransition1x"]

EV_TO_KCAL_PER_MOL = 23.06  # dpd.py:282


def process_log_to_xyz(log_file: str | Path, xyz_file: str | Path) -> bool:
    """Scrape a Q-Chem ``.log`` into a minimal ``.xyz``
    (dpd.py:63-100): atom count from the line after 'NAtoms', coordinates
    from the block after '$molecule'.  Returns False (and prints) on any
    parse failure, mirroring the reference's keep-going behavior."""
    log_file, xyz_file = Path(log_file), Path(xyz_file)
    try:
        lines = log_file.read_text().splitlines(keepends=True)
        natom = None
        for i, line in enumerate(lines):
            if "NAtoms" in line:
                natom = int(lines[i + 1].split()[0])
                break
        molecule_start = None
        for i, line in enumerate(lines):
            if "$molecule" in line:
                molecule_start = i + 2
                break
        molecule_data = lines[molecule_start: molecule_start + natom]
        with xyz_file.open("w") as f:
            f.write(f"{natom}\n\n")
            f.writelines(molecule_data)
        return True
    except Exception as e:
        print(f"Error processing {log_file}: {e}")
        return False


def match_reaction(r_numbers: str, p_positions: np.ndarray,
                   candidates_by_formula: dict[str, list[int]],
                   product_positions: list[np.ndarray]) -> int:
    """T1x record -> wb97xd3 reaction index (dpd.py:284-307): candidates
    share the reactant's concatenated atomic-number string; the winner has
    the closest product geometry (min Frobenius distance)."""
    candidates = candidates_by_formula.get(r_numbers, [])
    if not candidates:
        raise KeyError(f"no wb97xd3 candidate for formula string {r_numbers}")
    dists = [float(np.linalg.norm(p_positions - product_positions[i]))
             for i in candidates]
    return candidates[int(np.argmin(dists))]


class PreProcessTransition1x:
    """Orchestrates the full acquisition (dpd.py:145-331)."""

    def __init__(self,
                 fpath_download: str = "downloaded_datasets",
                 fpath_processed: str = "datasets",
                 dlink_transition: str =
                 "https://figshare.com/ndownloader/files/36035789/transition1x.h5",
                 dlink_wb97xd3_csv: str =
                 "https://zenodo.org/records/3715478/files/wb97xd3.csv",
                 dlink_wb97xd3: str =
                 "https://zenodo.org/records/3715478/files/wb97xd3.tar.gz",
                 rxn_range: int = 11961,
                 keep_downloads: bool = False,
                 mace_device: str = "cpu"):
        self.fpath_download = Path(fpath_download)
        self.fpath_processed = Path(fpath_processed)
        self.dlink_transition = dlink_transition
        self.dlink_wb97xd3 = dlink_wb97xd3
        self.dlink_wb97xd3_csv = dlink_wb97xd3_csv
        self.fpath_wb97xd3_csv = self.fpath_download / os.path.basename(
            dlink_wb97xd3_csv)
        self.fpath_transition = self.fpath_download / os.path.basename(
            dlink_transition)
        self.folder_to_extract = (self.fpath_download /
                                  os.path.basename(dlink_wb97xd3).split(".")[0])
        self.rxn_range = rxn_range
        self.keep_downloads = keep_downloads
        self.mace_device = mace_device

    # -- orchestration ----------------------------------------------------
    def start_data_acquisition(
            self, data_sets: list[str] = ["train", "val", "test"]) -> None:
        self.create_folders()
        self.download_files()
        print(f"Start of the extraction of {self.folder_to_extract}")
        self.extract_files()
        print("End of the extraction")
        print("Beginning of the dataset creation.")
        self.create_dataset_files(data_sets)

    def create_folders(self) -> None:
        self.fpath_processed.mkdir(parents=True, exist_ok=True)
        self.fpath_download.mkdir(parents=True, exist_ok=True)

    def download_files(self) -> None:
        """Download missing archives (dpd.py:211-227). This image has zero
        network egress; a clear error beats a hang."""
        for url in [self.dlink_transition, self.dlink_wb97xd3,
                    self.dlink_wb97xd3_csv]:
            file_path = self.fpath_download / os.path.basename(url)
            if file_path.exists():
                continue
            print(f"Downloading: {file_path.name}")
            try:
                urllib.request.urlretrieve(url, file_path.as_posix())
            except Exception as e:
                raise RuntimeError(
                    f"download of {url} failed ({e}); place the file at "
                    f"{file_path} manually and re-run") from e

    def extract_files(self) -> None:
        fpath = self.fpath_download / os.path.basename(self.dlink_wb97xd3)
        shutil.unpack_archive(fpath, self.fpath_download)
        print(f"File {fpath.name} extracted to {self.fpath_download}")

    # -- dataset creation -------------------------------------------------
    def _load_rxn_structures(self):
        import ase.io
        rrs, pps = [], []
        for i in range(self.rxn_range):
            rxn_id = f"{i:06d}"
            folder = self.folder_to_extract / f"rxn{rxn_id}"
            process_log_to_xyz(folder / f"r{rxn_id}.log",
                               folder / f"r{rxn_id}.xyz")
            process_log_to_xyz(folder / f"p{rxn_id}.log",
                               folder / f"p{rxn_id}.xyz")
            rrs.append(ase.io.read(folder / f"r{rxn_id}.xyz"))
            pps.append(ase.io.read(folder / f"p{rxn_id}.xyz"))
        return rrs, pps

    def create_dataset_files(self, data_sets: list[str]) -> None:
        try:
            import ase.io
            from ase import Atoms
            from ase.calculators.singlepoint import SinglePointCalculator
            from transition1x import Dataloader
        except ImportError as e:
            raise ImportError(
                "dataset creation needs the optional 'ase' and "
                "'transition1x' packages (offline host step)") from e
        import csv as _csv

        rrs, pps = self._load_rxn_structures()
        # memoized formula index (improvement over dpd.py:289-296)
        by_formula: dict[str, list[int]] = {}
        for i, rr in enumerate(rrs):
            key = "".join(str(n) for n in rr.symbols.numbers)
            by_formula.setdefault(key, []).append(i)
        pp_pos = [pp.positions for pp in pps]

        rows = {}
        with open(self.fpath_wb97xd3_csv, newline="") as f:
            for row in _csv.DictReader(f):
                rows[int(row["idx"])] = row

        for split in data_sets:
            dataloader = Dataloader(self.fpath_transition, only_final=True,
                                    datasplit=split)
            all_structures, e_a, rxns = [], [], []
            for molecule in dataloader:
                for s in ["reactant", "transition_state", "product"]:
                    atoms = Atoms(molecule[s]["atomic_numbers"])
                    atoms.set_positions(molecule[s]["positions"])
                    atoms.calc = SinglePointCalculator(
                        atoms,
                        energy=molecule[s]["wB97x_6-31G(d).energy"],
                        forces=molecule[s]["wB97x_6-31G(d).forces"])
                    all_structures.append(atoms)
                ts_e = molecule["transition_state"]["wB97x_6-31G(d).energy"]
                r_e = molecule["reactant"]["wB97x_6-31G(d).energy"]
                e_a.append((ts_e - r_e) * EV_TO_KCAL_PER_MOL)
                r, p = all_structures[-3], all_structures[-1]
                idx = match_reaction(
                    "".join(str(n) for n in r.symbols.numbers),
                    p.positions, by_formula, pp_pos)
                rxns.append(f"{rows[idx]['rsmi']}>>{rows[idx]['psmi']}")

            ase.io.write(self.fpath_processed / f"{split}.xyz",
                         all_structures)
            with open(self.fpath_processed / f"{split}.csv", "w",
                      newline="") as f:
                w = _csv.writer(f)
                w.writerow(["smiles", "ea"])
                w.writerows(zip(rxns, e_a))

            from .descriptors import process_xyz_to_npz
            process_xyz_to_npz(self.fpath_processed / f"{split}.csv",
                               self.fpath_processed / f"{split}.xyz",
                               self.fpath_processed / f"{split}.npz",
                               device=self.mace_device)

        if not self.keep_downloads:
            shutil.rmtree(self.fpath_download)
