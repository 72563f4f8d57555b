"""Generate the vendored featurizer differential corpus.

Writes ``tests/corpus_reactions.csv`` — a few hundred diverse, fully
atom-mapped T1x-style reaction SMILES (fused heteroaromatics, charged
species, isotopes, explicit-H transfers, multi-fragment reactions) — used
by:

* ``tests/test_corpus.py``   — Python-vs-C++ featurizer bit-parity on every
  line, plus contract invariants (78/14 dims, pair layout).
* ``chem/rdkit_check.py``    — auto-verification against RDKit the moment
  it is importable on a connected host (cli.runbook step 0).

Expansion strategy: every seed reaction is validated through the package's
own ``RxnGraph`` (malformed templates fail generation, not test time), then
mechanically diversified with semantics-preserving transforms that exercise
featurizer order-sensitivity — atom-map renumbering (map_reac_to_prod),
fragment reordering, direction reversal, and disjoint-map reaction unions
(multi-molecule CGRs).  Deterministic: re-running reproduces the file.

Reference contract: graph_features.py:4-63 (features),
:83-103 (atom-map alignment), :154-195 (CGR union edges).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from cgr_mpnn_3d_tpu.chem import RxnGraph  # noqa: E402

_MAP_RE = re.compile(r":(\d+)\]")

# -- hand-written mapped molecules (identity reactions) -----------------------
# fused heteroaromatics, charges, isotopes, strained rings, cumulenes
MOLECULES = [
    # benzene / pyridine / pyrrole / imidazole / furan / thiophene
    "[c:1]1([H:7])[c:2]([H:8])[c:3]([H:9])[c:4]([H:10])[c:5]([H:11])[c:6]1[H:12]",
    "[c:1]1([H:7])[c:2]([H:8])[c:3]([H:9])[c:4]([H:10])[c:5]([H:11])[n:6]1",
    "[c:1]1([H:6])[c:2]([H:7])[c:3]([H:8])[c:4]([H:9])[n:5]1[H:10]",
    "[c:1]1([H:6])[n:2][c:3]([H:7])[n:4]([H:9])[c:5]1[H:8]",
    "[c:1]1([H:6])[c:2]([H:7])[c:3]([H:8])[c:4]([H:9])[o:5]1",
    "[c:1]1([H:6])[c:2]([H:7])[c:3]([H:8])[c:4]([H:9])[s:5]1",
    # fused: indole, benzofuran, quinoline, purine-like
    "[c:1]1([H:10])[c:2]([H:11])[c:3]([H:12])[c:4]2[n:5]([H:13])[c:6]([H:14])"
    "[c:7]([H:15])[c:8]2[c:9]1[H:16]",
    "[c:1]1([H:10])[c:2]([H:11])[c:3]([H:12])[c:4]2[o:5][c:6]([H:13])"
    "[c:7]([H:14])[c:8]2[c:9]1[H:15]",
    "[c:1]1([H:11])[c:2]([H:12])[c:3]([H:13])[c:4]2[n:5][c:6]([H:14])"
    "[c:7]([H:15])[c:8]([H:16])[c:9]2[c:10]1[H:17]",
    "[c:1]1([H:10])[n:2][c:3]2[c:4]([n:5]1[H:11])[n:6][c:7]([H:12])[n:8]"
    "[c:9]2[H:13]",
    # charged species
    "[N+:1]([H:2])([H:3])([H:4])[H:5]",
    "[O-:1][H:2]",
    "[O+:1]([H:2])([H:3])[H:4]",
    "[C-:1]#[O+:2]",
    "[N+:1](=[O:2])([O-:3])[C:4]([H:5])([H:6])[H:7]",
    "[C:1](=[O:2])([O-:3])[H:4]",
    # isotopes
    "[13C:1]([H:2])([H:3])([H:4])[H:5]",
    "[2H:1][O:2][H:3]",
    # strained rings / cumulene / conjugation
    "[C:1]1([H:4])([H:5])[C:2]([H:6])([H:7])[O:3]1",
    "[C:1]1([H:5])([H:6])[C:2]([H:7])([H:8])[C:3]1([H:9])[H:10]",
    "[C:1](=[C:2]=[C:3]([H:4])[H:5])([H:6])[H:7]",
    "[C:1](=[C:2]([H:5])[C:3]([H:6])=[C:4]([H:7])[H:8])([H:9])[H:10]",
    "[C:1](#[C:2][H:3])[H:4]",
    # heteroatom chains / classic functional groups
    "[C:1]([H:5])([H:6])([H:7])[O:2][C:3]([H:8])([H:9])[C:4](=[O:10])[H:11]",
    "[N:1]([H:4])([H:5])[C:2](=[O:3])[H:6]",
    "[C:1]([H:4])([H:5])([H:6])[N:2]=[C:3]([H:7])[H:8]",
    "[O:1]=[C:2]=[O:3]",
    "[C:1]([H:3])([H:4])=[O:2]",
]

# -- hand-written reaction templates ------------------------------------------
REACTIONS = [
    # keto-enol tautomerization (H transfer C->O)
    "[C:1]([H:4])([H:5])([H:6])[C:2](=[O:3])[H:7]>>"
    "[C:1]([H:4])([H:5])=[C:2]([O:3][H:6])[H:7]",
    # oxirane ring opening -> acetaldehyde
    "[C:1]1([H:4])([H:5])[C:2]([H:6])([H:7])[O:3]1>>"
    "[C:1]([H:4])([H:5])([H:6])[C:2](=[O:3])[H:7]",
    # ammonia N-H homolysis (fragmenting product)
    "[N:1]([H:2])([H:3])[H:4]>>[N:1]([H:2])[H:3].[H:4]",
    # water elimination from ethanol -> ethylene + water
    "[C:1]([H:5])([H:6])([H:7])[C:2]([H:8])([H:9])[O:3][H:4]>>"
    "[C:1]([H:5])([H:6])=[C:2]([H:8])[H:9].[O:3]([H:4])[H:7]",
    # HCN <-> HNC isomerization
    "[C:1](#[N:2])[H:3]>>[C-:1]#[N+:2][H:3]",
    # formaldehyde + hydride-style H transfer (methoxide formation)
    "[C:1]([H:3])([H:4])=[O:2].[H:5][H:6]>>"
    "[C:1]([H:3])([H:4])([H:5])[O:2][H:6]",
    # Diels-Alder: butadiene + ethylene -> cyclohexene
    "[C:1](=[C:2]([H:9])[C:3]([H:10])=[C:4]([H:11])[H:12])([H:7])[H:8]."
    "[C:5]([H:13])([H:14])=[C:6]([H:15])[H:16]>>"
    "[C:1]1([H:7])([H:8])[C:2]([H:9])=[C:3]([H:10])[C:4]([H:11])([H:12])"
    "[C:5]([H:13])([H:14])[C:6]1([H:15])[H:16]",
    # nitrile <-> isonitrile
    "[C:1]([H:4])([H:5])([H:6])[C:2]#[N:3]>>"
    "[C:1]([H:4])([H:5])([H:6])[N+:3]#[C-:2]",
    # CO2 + H2O -> carbonic-acid-like
    "[O:1]=[C:2]=[O:3].[O:4]([H:5])[H:6]>>"
    "[O:1]=[C:2]([O:3][H:5])[O:4][H:6]",
    # methanimine H shift -> aminocarbene (real T1x-type chemistry)
    "[C:1]([H:4])([H:5])([H:6])[N:2]=[C:3]([H:7])[H:8]>>"
    "[C:1]([H:4])([H:5])([H:6])[N:2]([H:7])[C:3][H:8]",
    # proton transfer between charged species
    "[N+:1]([H:2])([H:3])([H:4])[H:5].[O-:6][H:7]>>"
    "[N:1]([H:2])([H:3])[H:4].[O:6]([H:5])[H:7]",
    # aromatic ring H shift (pyrrole 1H -> 2H-like, breaks aromaticity)
    "[c:1]1([H:6])[c:2]([H:7])[c:3]([H:8])[c:4]([H:9])[n:5]1[H:10]>>"
    "[C:1]1([H:6])([H:10])[C:2]([H:7])=[C:3]([H:8])[C:4]([H:9])=[N:5]1",
    # methyl formate decarbonylation -> methanol + CO
    "[C:1]([H:4])([H:5])([H:6])[O:2][C:3](=[O:7])[H:8]>>"
    "[C:1]([H:4])([H:5])([H:6])[O:2][H:8].[C-:3]#[O+:7]",
    # formamide -> HNCO + H2
    "[N:1]([H:4])([H:5])[C:2](=[O:3])[H:6]>>"
    "[N:1](=[C:2]=[O:3])[H:4].[H:5][H:6]",
    # carbene-style CH2 extrusion from cyclopropane
    "[C:1]1([H:5])([H:6])[C:2]([H:7])([H:8])[C:3]1([H:9])[H:10]>>"
    "[C:1]([H:5])([H:6])=[C:2]([H:7])[H:8].[C:3]([H:9])[H:10]",
]


def remap(smi: str, perm: dict[int, int]) -> str:
    return _MAP_RE.sub(lambda m: f":{perm[int(m.group(1))]}]", smi)


def maps_of(smi: str) -> list[int]:
    return [int(m.group(1)) for m in _MAP_RE.finditer(smi)]


def permuted(rxn: str, rng: np.random.Generator) -> str:
    ms = sorted(set(maps_of(rxn)))
    tgt = list(ms)
    rng.shuffle(tgt)
    return remap(rxn, dict(zip(ms, tgt)))


def reordered_fragments(rxn: str, rng: np.random.Generator) -> str:
    reac, prod = rxn.split(">>")
    sides = []
    for side in (reac, prod):
        frags = side.split(".")
        rng.shuffle(frags)
        sides.append(".".join(frags))
    return ">>".join(sides)


def reversed_rxn(rxn: str) -> str:
    reac, prod = rxn.split(">>")
    return f"{prod}>>{reac}"


def union(rxn_a: str, rxn_b: str) -> str:
    off = max(maps_of(rxn_a))
    ms = sorted(set(maps_of(rxn_b)))
    rxn_b = remap(rxn_b, {m: m + off for m in ms})
    ra, pa = rxn_a.split(">>")
    rb, pb = rxn_b.split(">>")
    return f"{ra}.{rb}>>{pa}.{pb}"


def main() -> None:
    # demo reactions are known-good seeds in the exact T1x style
    demo = REPO / "examples" / "demo.csv"
    seeds = [ln.split(",")[0] for ln in demo.read_text().splitlines()[1:]
             if ln.strip()]
    seeds += REACTIONS
    seeds += [f"{m}>>{m}" for m in MOLECULES]

    rng = np.random.default_rng(20260819)
    corpus: list[str] = []
    seen: set[str] = set()

    def add(rxn: str) -> None:
        if rxn in seen:
            return
        # atom maps must be unique per side — duplicates make the reac->prod
        # alignment ambiguous (dict-order dependent in the reference too)
        for side in rxn.split(">>"):
            ms = maps_of(side)
            assert len(ms) == len(set(ms)), f"duplicate atom maps: {rxn}"
        g = RxnGraph(rxn)                      # must parse + featurize
        a = g.arrays
        assert a.node_feats.shape[1] == 78, rxn
        assert a.edge_feats.shape[1] == 14, rxn
        assert len(a.senders) % 2 == 0, rxn
        seen.add(rxn)
        corpus.append(rxn)

    for s in seeds:
        add(s)
        for _ in range(3):
            add(permuted(s, rng))
        add(reversed_rxn(s))
        add(permuted(reversed_rxn(s), rng))
        add(reordered_fragments(s, rng))

    # multi-molecule CGR unions of dissimilar seeds
    for i in range(0, len(seeds) - 7, 3):
        add(union(seeds[i], seeds[i + 7]))

    labels = rng.uniform(5.0, 120.0, size=len(corpus))
    out = REPO / "tests" / "corpus_reactions.csv"
    with out.open("w") as f:
        f.write("smiles,ea\n")
        for smi, y in zip(corpus, labels):
            f.write(f"{smi},{y:.6f}\n")
    print(f"wrote {len(corpus)} reactions -> {out}")


if __name__ == "__main__":
    main()
