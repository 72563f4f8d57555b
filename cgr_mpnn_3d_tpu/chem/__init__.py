"""Host-side chemistry: SMILES parsing, perception, featurization.

Replaces the reference's RDKit (C++) dependency with a self-contained stack
(see /root/reference/cgr_mpnn_3D/utils/graph_features.py for the feature
contracts this package reproduces).
"""

from .featurize import (ATOM_FDIM, BOND_FDIM, RXN_ATOM_FDIM, RXN_BOND_FDIM,
                        GraphArrays, MolGraph, RxnGraph, atom_features,
                        bond_features, map_reac_to_prod, onek_encoding_unk)
from .mol import Molecule, mol_from_smiles
from .smiles import SmilesError, parse_smiles

__all__ = [
    "ATOM_FDIM", "BOND_FDIM", "RXN_ATOM_FDIM", "RXN_BOND_FDIM",
    "GraphArrays", "MolGraph", "RxnGraph", "atom_features", "bond_features",
    "map_reac_to_prod", "onek_encoding_unk", "Molecule", "mol_from_smiles",
    "SmilesError", "parse_smiles",
]
