"""Chemistry-layer tests.

Mirrors the reference's cgr_mpnn_3D/tests/test_molgraph.py:20-77 (bond
features, unk encoding, MolGraph/RxnGraph counts, reverse-edge invariant,
reac->prod mapping) and adds parser/perception coverage for the fully
atom-mapped Transition1x SMILES style.
"""

import numpy as np
import pytest

from cgr_mpnn_3d_tpu.chem import (ATOM_FDIM, BOND_FDIM, RXN_ATOM_FDIM,
                                  RXN_BOND_FDIM, MolGraph, RxnGraph,
                                  SmilesError, atom_features, bond_features,
                                  map_reac_to_prod, mol_from_smiles,
                                  onek_encoding_unk, parse_smiles)
from cgr_mpnn_3d_tpu.chem.mol import HYB_SP, HYB_SP2, HYB_SP3

# A row from the reference demo set (cli_tool/files/demo.csv:2).
DEMO_RXN = ("[N:1]([c:2]1[n:3][o:4][c:5](=[O:6])[n:7]1[H:10])([H:8])[H:9]"
            ">>[C-:5]#[O+:6].[N:1](/[C:2]([N:3]=[O:4])=[N:7]\\[H:10])"
            "([H:8])[H:9]")


class TestParser:
    def test_simple_chain(self):
        p = parse_smiles("CCO")
        assert len(p.atoms) == 3
        assert len(p.bonds) == 2
        assert [a.symbol for a in p.atoms] == ["C", "C", "O"]

    def test_brackets(self):
        p = parse_smiles("[13CH3+:7]")
        a = p.atoms[0]
        assert (a.symbol, a.isotope, a.h_count, a.charge, a.map_num) == \
            ("C", 13, 3, 1, 7)

    def test_charges(self):
        assert parse_smiles("[O-]").atoms[0].charge == -1
        assert parse_smiles("[N+2]").atoms[0].charge == 2
        assert parse_smiles("[Fe++]").atoms[0].charge == 2

    def test_two_letter_elements(self):
        p = parse_smiles("ClCCBr")
        assert [a.symbol for a in p.atoms] == ["Cl", "C", "C", "Br"]

    def test_ring_closure(self):
        p = parse_smiles("C1CCCCC1")
        assert len(p.bonds) == 6

    def test_percent_ring_closure(self):
        p = parse_smiles("C%10CCCCC%10")
        assert len(p.bonds) == 6

    def test_branches_and_dots(self):
        p = parse_smiles("CC(=O)O.[Na+]")
        assert len(p.atoms) == 5
        assert len(p.bonds) == 3

    def test_errors(self):
        for bad in ["C(", "C)", "C1CC", "C#", "[Xx]", "C=#C"]:
            with pytest.raises(SmilesError):
                parse_smiles(bad)

    def test_demo_reaction_fragments(self):
        reac, _, prod = DEMO_RXN.split(">")
        assert len(parse_smiles(reac).atoms) == 10
        assert len(parse_smiles(prod).atoms) == 10


class TestPerception:
    def test_ethanol(self):
        m = mol_from_smiles("CCO")
        c0 = m.atoms[0]
        assert (c0.num_hs, c0.total_degree, c0.hybridization) == (3, 4, HYB_SP3)
        o = m.atoms[2]
        assert (o.num_hs, o.total_degree, o.hybridization) == (1, 2, HYB_SP3)

    def test_explicit_h_atoms_give_zero_numhs(self):
        # RDKit GetTotalNumHs() does not count neighboring explicit H atoms.
        m = mol_from_smiles("[N:1]([H:2])([H:3])[H:4]")
        n = m.atoms[0]
        assert n.num_hs == 0
        assert n.degree == 3
        assert n.total_degree == 3

    def test_carbonyl_sp2(self):
        m = mol_from_smiles("CC=O")
        assert m.atoms[1].hybridization == HYB_SP2
        assert m.atoms[2].hybridization == HYB_SP2

    def test_charged_triple_bond_sp(self):
        m = mol_from_smiles("[C-]#[O+]")
        assert m.atoms[0].hybridization == HYB_SP
        assert m.atoms[1].hybridization == HYB_SP

    def test_benzene(self):
        m = mol_from_smiles("c1ccccc1")
        for a in m.atoms:
            assert a.aromatic and a.num_hs == 1 and a.total_degree == 3
            assert a.hybridization == HYB_SP2
        for b in m.bonds:
            assert b.aromatic and b.in_ring and b.conjugated
        # kekulization: exactly 3 double bonds
        assert sum(1 for b in m.bonds if b.order == 2) == 3

    def test_pyrrole_n_sp2(self):
        m = mol_from_smiles("c1cc[nH]c1")
        n_atom = next(a for a in m.atoms if a.symbol == "N")
        assert n_atom.hybridization == HYB_SP2
        assert n_atom.num_hs == 1

    def test_biphenyl_linker_single(self):
        m = mol_from_smiles("c1ccc(cc1)-c1ccccc1")
        linker = [b for b in m.bonds if not b.in_ring]
        assert len(linker) == 1
        assert not linker[0].aromatic
        assert linker[0].order == 1

    def test_conjugation_butadiene(self):
        m = mol_from_smiles("C=CC=C")
        assert all(b.conjugated for b in m.bonds)

    def test_no_conjugation_propene_tail(self):
        m = mol_from_smiles("C=CC")
        single = m.bond_between(1, 2)
        assert not single.conjugated

    def test_amide_conjugation(self):
        m = mol_from_smiles("CC(=O)N")
        assert m.bond_between(1, 2).conjugated  # C=O
        assert m.bond_between(1, 3).conjugated  # C-N

    def test_ring_membership(self):
        m = mol_from_smiles("C1CC1CC")
        ring_bonds = [b for b in m.bonds if b.in_ring]
        assert len(ring_bonds) == 3
        assert m.atoms[0].in_ring and not m.atoms[4].in_ring

    def test_demo_aromatic_ring_kekulizes(self):
        reac, _, _ = DEMO_RXN.split(">")
        m = mol_from_smiles(reac)
        ring_atoms = [a for a in m.atoms if a.in_ring]
        assert len(ring_atoms) == 5
        assert all(a.aromatic for a in ring_atoms)


class TestFeatures:
    def test_onek_encoding_unk(self):
        # Mirrors reference test_molgraph.py:31-37.
        choices = ["A", "B", "C"]
        assert onek_encoding_unk("A", choices) == [1, 0, 0, 0]
        assert onek_encoding_unk("D", choices) == [0, 0, 0, 1]

    def test_bond_features_double(self):
        # Mirrors reference test_molgraph.py:22-29.
        m = mol_from_smiles("C=C")
        f = bond_features(m.bonds[0])
        assert len(f) == 7
        assert f[1] == 0 and f[2] == 1

    def test_bond_features_none(self):
        assert bond_features(None) == [1, 0, 0, 0, 0, 0, 0]

    def test_atom_feature_dim_and_values(self):
        m = mol_from_smiles("CCO")
        f = atom_features(m, 0)
        assert len(f) == ATOM_FDIM == 39
        assert f[1] == 1                      # symbol C
        assert f[12 + 4] == 1                 # total degree 4
        assert f[19 + 4] == 1                 # charge 0 (index 4 of [-1,-2,1,2,0])
        assert f[25 + 3] == 1                 # 3 Hs
        assert f[31 + 2] == 1                 # SP3
        assert f[37] == 0                     # not aromatic
        assert abs(f[38] - 0.12011) < 1e-6    # 0.01 * mass

    def test_hydrogen_atom_unk_slots(self):
        m = mol_from_smiles("[CH3:1][H:2]")  # explicit H as graph atom
        f = atom_features(m, 1)
        assert f[0] == 1                      # symbol H
        assert f[31 + 5] == 1                 # hybridization -> unk slot


class TestGraphs:
    def test_molgraph_counts(self):
        # Mirrors reference test_molgraph.py:39-45 (2x reverse-edge invariant).
        g = MolGraph("CCO")
        assert len(g.f_atoms) == 3
        assert len(g.f_bonds) == 4
        assert len(g.edge_index) == 4
        arr = g.arrays
        assert arr.node_feats.shape == (3, ATOM_FDIM)
        assert arr.edge_feats.shape == (4, BOND_FDIM)

    def test_rev_edge_index(self):
        arr = MolGraph("CCO").arrays
        for e in range(arr.num_edges):
            r = arr.rev_edge_index[e]
            assert arr.senders[e] == arr.receivers[r]
            assert arr.receivers[e] == arr.senders[r]
            assert arr.rev_edge_index[r] == e

    def test_rxn_graph_counts(self):
        # Mirrors reference test_molgraph.py:47-58.
        g = RxnGraph("CCO>>CC=O")
        assert len(g.f_atoms) == 3
        assert len(g.f_bonds) == 4
        assert len(g.edge_index) == 4
        assert g.f_atoms[0] != g.f_atoms[1]
        assert g.arrays.node_feats.shape == (3, RXN_ATOM_FDIM)
        assert g.arrays.edge_feats.shape == (4, RXN_BOND_FDIM)

    def test_map_reac_to_prod_unmapped(self):
        # Mirrors reference test_molgraph.py:69-77: with no atom maps all
        # entries share map 0, so every reactant atom maps to the last
        # product atom carrying map 0.
        mapping = map_reac_to_prod(mol_from_smiles("CCO"),
                                   mol_from_smiles("CC=O"))
        assert mapping[0] == 2
        assert mapping[1] == 2

    def test_demo_rxn_graph(self):
        g = RxnGraph(DEMO_RXN)
        arr = g.arrays
        assert arr.node_feats.shape[1] == RXN_ATOM_FDIM
        # union edge set: at least the reactant's bonds, padded pairs
        assert arr.num_edges % 2 == 0
        assert arr.num_edges >= 2 * 10
        # first half of a node feature row is the reactant part; diffs are
        # nonzero somewhere because the reaction breaks the ring
        diff = arr.node_feats[:, ATOM_FDIM:]
        assert np.abs(diff).sum() > 0

    def test_union_edge_no_bond_encoding(self):
        # reactant has C-C bond, product fragments it: prod-side features must
        # be the no-bond vector
        g = RxnGraph("[CH3:1][CH3:2]>>[CH3:1].[CH3:2]")
        fb = np.asarray(g.f_bonds[0])
        assert fb[1] == 1                      # reac single bond
        assert fb[BOND_FDIM + 0] == 1          # prod no-bond = 1 - 0
        assert fb[BOND_FDIM + 1] == -1         # prod single diff = 0 - 1

    def test_agents_ignored(self):
        g1 = RxnGraph("CCO>C>CCO")
        g2 = RxnGraph("CCO>>CCO")
        np.testing.assert_array_equal(g1.arrays.node_feats, g2.arrays.node_feats)


class TestParserRobustness:
    """Fuzz: mutated SMILES must either parse or raise SmilesError /
    KekulizeError — never crash, hang, or corrupt state."""

    def test_mutation_fuzz(self):
        import random
        from cgr_mpnn_3d_tpu.chem.mol import KekulizeError
        rng = random.Random(0)
        seeds = [DEMO_RXN.split(">")[0], "c1ccccc1", "CC(=O)OC",
                 "[N+:1]([O-:2])=[O:3]", "C%10CCCCC%10", "ClCCBr"]
        alphabet = "CNOcn()[]=#123+-:@H%.>\\/"
        checked = 0
        for base in seeds:
            for _ in range(300):
                s = list(base)
                for _ in range(rng.randint(1, 4)):
                    op = rng.random()
                    i = rng.randrange(len(s) + 1)
                    if op < 0.4 and s:
                        del s[min(i, len(s) - 1)]
                    elif op < 0.8:
                        s.insert(i, rng.choice(alphabet))
                    elif s:
                        s[min(i, len(s) - 1)] = rng.choice(alphabet)
                mutated = "".join(s)
                try:
                    parse_smiles(mutated)
                    mol_from_smiles(mutated)
                except (SmilesError, KekulizeError, KeyError):
                    pass
                checked += 1
        assert checked == len(seeds) * 300

    def test_native_fuzz_agrees_on_validity(self):
        """Native parser accepts/rejects the same strings (spot sample)."""
        from cgr_mpnn_3d_tpu import native
        if not native.available():
            pytest.skip("native unavailable")
        import random
        from cgr_mpnn_3d_tpu.chem.mol import KekulizeError
        rng = random.Random(1)
        alphabet = "CNOcn()[]=#12+-H"
        for _ in range(400):
            s = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 12)))
            try:
                MolGraph(s)
                py_ok = True
            except (SmilesError, KekulizeError, KeyError):
                py_ok = False
            try:
                native.featurize(s, "mol")
                nat_ok = True
            except native.NativeError:
                nat_ok = False
            assert py_ok == nat_ok, s


class TestAromaticityPerception:
    """RDKit perceives aromaticity regardless of how the SMILES is written;
    kekulized rings must featurize identically to their lowercase forms."""

    PAIRS = [("C1=CC=CC=C1", "c1ccccc1"),
             ("C1=CC=NC=C1", "c1ccncc1"),
             ("C1=CC=CO1", "c1cco1".replace("o1", "oc1"))]

    def test_kekulized_equals_aromatic_features(self):
        for kek, arom in [("C1=CC=CC=C1", "c1ccccc1")]:
            a = MolGraph(kek).arrays
            b = MolGraph(arom).arrays
            np.testing.assert_allclose(a.node_feats, b.node_feats,
                                       err_msg=kek)
            np.testing.assert_allclose(a.edge_feats, b.edge_feats,
                                       err_msg=kek)

    def test_perception_positives(self):
        for smi, n_arom in [("C1=CC=CC=C1", 6),
                            ("C1=CC=C2C=CC=CC2=C1", 10),
                            ("C1=CC=NC=C1", 6),
                            ("C1=CC=CN1", 5),
                            ("C1=CC=CO1", 5)]:
            m = mol_from_smiles(smi)
            assert sum(a.aromatic for a in m.atoms) == n_arom, smi
            # orders stay as written (valid kekulization preserved)
            assert sum(1 for b in m.bonds if b.order == 2) >= 2

    def test_perception_negatives(self):
        for smi in ["C1CCCCC1", "C1=CCCCC1", "C1=CC=C1", "C1=CC1",
                    "O=C1C=CC(=O)C=C1", "CC=CC"]:
            m = mol_from_smiles(smi)
            assert not any(a.aromatic for a in m.atoms), smi

    def test_native_perception_parity(self):
        from cgr_mpnn_3d_tpu import native
        if not native.available():
            pytest.skip("native unavailable")
        for smi in ["C1=CC=CC=C1", "C1=CC=C2C=CC=CC2=C1", "C1=CC=NC=C1",
                    "C1CCCCC1", "O=C1C=CC(=O)C=C1", "C1=CC=CN1"]:
            a = native.featurize(smi, "mol")
            b = MolGraph(smi).arrays
            np.testing.assert_allclose(a.node_feats, b.node_feats,
                                       err_msg=smi)
            np.testing.assert_allclose(a.edge_feats, b.edge_feats,
                                       err_msg=smi)
