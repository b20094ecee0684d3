"""Oracle tests for the dependency-free SMILES parser (data/smiles.py).

rdkit cannot run in this environment, so the oracle is hand-derived
chemistry for molecules whose structure is unambiguous, expressed in
the reference's output schema (get_data.py:62-73: bonds SINGLE 1 /
DOUBLE 2 / TRIPLE 3 / AROMATIC 4; hydrogens materialised as nodes).
"""

import pytest

from ggnn_tpu.data import qm9
from ggnn_tpu.data.smiles import SmilesError, parse_smiles, smiles_to_graph


def formula(symbols):
    f = {}
    for s in symbols:
        f[s] = f.get(s, 0) + 1
    return f


def edge_multiset(edges):
    """Direction-free (min, type, max) multiset."""
    return sorted((min(a, b), t, max(a, b)) for a, t, b in edges)


def degree_sums(symbols, edges, aromatic_order=1.5):
    order = {1: 1.0, 2: 2.0, 3: 3.0, 4: aromatic_order}
    d = [0.0] * len(symbols)
    for a, t, b in edges:
        d[a] += order[t]
        d[b] += order[t]
    return d


# ---------------------------------------------------------------- fixed oracle


def test_methane():
    symbols, edges = parse_smiles("C")
    assert symbols == ["C", "H", "H", "H", "H"]
    assert edge_multiset(edges) == [(0, 1, 1), (0, 1, 2), (0, 1, 3),
                                    (0, 1, 4)]


def test_ammonia_and_water_and_hf():
    assert formula(parse_smiles("N")[0]) == {"N": 1, "H": 3}
    assert formula(parse_smiles("O")[0]) == {"O": 1, "H": 2}
    assert formula(parse_smiles("F")[0]) == {"F": 1, "H": 1}


def test_ethanol():
    symbols, edges = parse_smiles("CCO")
    assert symbols == ["C", "C", "O"] + ["H"] * 6
    # heavy skeleton then AddHs-style hydrogens grouped by parent
    assert edges[:2] == [(0, 1, 1), (1, 1, 2)]
    assert edges[2:] == [(0, 1, 3), (0, 1, 4), (0, 1, 5),
                         (1, 1, 6), (1, 1, 7), (2, 1, 8)]


def test_benzene():
    symbols, edges = parse_smiles("c1ccccc1")
    assert formula(symbols) == {"C": 6, "H": 6}
    ring = [e for e in edges if e[1] == 4]
    assert edge_multiset(ring) == [(0, 4, 1), (0, 4, 5), (1, 4, 2),
                                   (2, 4, 3), (3, 4, 4), (4, 4, 5)]
    # every carbon carries exactly one hydrogen
    h_parents = sorted(a for a, t, b in edges if symbols[b] == "H")
    assert h_parents == [0, 1, 2, 3, 4, 5]


def test_pyridine_nitrogen_has_no_hydrogen():
    symbols, edges = parse_smiles("c1ccncc1")
    assert formula(symbols) == {"C": 5, "N": 1, "H": 5}
    n_idx = symbols.index("N")
    assert all(not (symbols[b] == "H" and a == n_idx) for a, t, b in edges)


def test_pyrrole_bracket_nH():
    symbols, edges = parse_smiles("c1cc[nH]c1")
    assert formula(symbols) == {"C": 4, "N": 1, "H": 5}
    n_idx = symbols.index("N")
    n_hydrogens = [b for a, t, b in edges if a == n_idx and symbols[b] == "H"]
    assert len(n_hydrogens) == 1
    assert sum(1 for e in edges if e[1] == 4) == 5  # aromatic ring bonds


def test_furan_oxygen_has_no_hydrogen():
    symbols, edges = parse_smiles("c1ccoc1")
    assert formula(symbols) == {"C": 4, "O": 1, "H": 4}


def test_acetonitrile_triple_bond():
    symbols, edges = parse_smiles("CC#N")
    assert formula(symbols) == {"C": 2, "N": 1, "H": 3}
    assert (1, 3, 2) in edges


def test_carbon_dioxide():
    symbols, edges = parse_smiles("O=C=O")
    assert symbols == ["O", "C", "O"]
    assert edge_multiset(edges) == [(0, 2, 1), (1, 2, 2)]


def test_cyclopropane_ring_closure():
    symbols, edges = parse_smiles("C1CC1")
    assert formula(symbols) == {"C": 3, "H": 6}
    heavy = [e for e in edges if symbols[e[2]] != "H"]
    assert edge_multiset(heavy) == [(0, 1, 1), (0, 1, 2), (1, 1, 2)]


def test_acetic_acid():
    symbols, edges = parse_smiles("CC(=O)O")
    assert formula(symbols) == {"C": 2, "O": 2, "H": 4}
    assert (1, 2, 2) in edges            # C=O
    assert (1, 1, 3) in edges            # C-O(H)
    # the carboxyl carbon is saturated: no H on atom 1
    assert all(not (a == 1 and symbols[b] == "H") for a, t, b in edges)
    # hydroxyl O carries the acid hydrogen
    assert any(a == 3 and symbols[b] == "H" for a, t, b in edges)


def test_cis_trans_marks_are_single_bonds():
    symbols, edges = parse_smiles("F/C=C/F")
    assert formula(symbols) == {"F": 2, "C": 2, "H": 2}
    assert (1, 2, 2) in edges
    assert (0, 1, 1) in edges


def test_toluene_junction_bond_is_single():
    symbols, edges = parse_smiles("Cc1ccccc1")
    assert formula(symbols) == {"C": 7, "H": 8}
    assert (0, 1, 1) in edges            # methyl-ring bond: single
    # the substituted ring carbon has no hydrogen
    assert all(not (a == 1 and symbols[b] == "H") for a, t, b in edges)


def test_tetrahedral_stereo_ignored():
    symbols, edges = parse_smiles("[C@@H](N)(O)F")
    assert formula(symbols) == {"C": 1, "N": 1, "O": 1, "F": 1, "H": 4}
    c_h = sum(1 for a, t, b in edges if a == 0 and symbols[b] == "H")
    assert c_h == 1                      # exactly the bracket's H


def test_isotope_and_explicit_h_count():
    symbols, edges = parse_smiles("[13CH4]")
    assert formula(symbols) == {"C": 1, "H": 4}


def test_disconnected_components():
    symbols, edges = parse_smiles("C.C")
    assert formula(symbols) == {"C": 2, "H": 8}
    assert all(not ({a, b} == {0, 1}) for a, t, b in edges)


def test_percent_ring_closure():
    symbols, edges = parse_smiles("C%10CC%10")
    assert formula(symbols) == {"C": 3, "H": 6}


def test_fused_aromatic_carbon_has_no_hydrogen():
    # naphthalene: the two fusion carbons carry 3 aromatic bonds -> 0 H
    symbols, edges = parse_smiles("c1ccc2ccccc2c1")
    assert formula(symbols) == {"C": 10, "H": 8}


def test_explicit_aromatic_bond_symbol():
    symbols, edges = parse_smiles("c1:c:c:c:c:c1")
    assert formula(symbols) == {"C": 6, "H": 6}


def test_ring_bond_symbol_on_either_end():
    for s in ("C=1CCCCC=1", "C1CCCCC=1", "C=1CCCCC1"):
        symbols, edges = parse_smiles(s)
        assert formula(symbols) == {"C": 6, "H": 10}, s
        assert sum(1 for e in edges if e[1] == 2) == 1, s


# ------------------------------------------------- Kekulé-form perception


def bond_types(edges):
    return sorted(t for _, t, _ in edges)


def test_kekule_benzene_matches_aromatic_form():
    ksym, kedges = parse_smiles("C1=CC=CC=C1")
    asym, aedges = parse_smiles("c1ccccc1")
    assert formula(ksym) == formula(asym) == {"C": 6, "H": 6}
    assert bond_types(kedges) == bond_types(aedges)
    assert sum(1 for t in bond_types(kedges) if t == 4) == 6


def test_kekule_heteroaromatics():
    # pyrrole: N keeps the H earned from its written single bonds
    symbols, edges = parse_smiles("C1=CC=CN1")
    assert formula(symbols) == {"C": 4, "N": 1, "H": 5}
    assert sum(1 for t in bond_types(edges) if t == 4) == 5
    # pyridine: N has an in-ring double, no H
    symbols, edges = parse_smiles("C1=CC=CC=N1")
    assert formula(symbols) == {"C": 5, "N": 1, "H": 5}
    assert sum(1 for t in bond_types(edges) if t == 4) == 6
    # furan
    symbols, edges = parse_smiles("C1=CC=CO1")
    assert formula(symbols) == {"C": 4, "O": 1, "H": 4}
    assert sum(1 for t in bond_types(edges) if t == 4) == 5
    # imidazole: donor N keeps its H, pyridine-type N does not
    symbols, edges = parse_smiles("C1=CN=CN1")
    assert formula(symbols) == {"C": 3, "N": 2, "H": 4}
    assert sum(1 for t in bond_types(edges) if t == 4) == 5


def test_kekule_naphthalene_including_fusion_bond():
    symbols, edges = parse_smiles("C1=CC=CC2=CC=CC=C12")
    assert formula(symbols) == {"C": 10, "H": 8}
    assert sum(1 for t in bond_types(edges) if t == 4) == 11
    assert all(t != 2 for t in bond_types(edges))


def test_kekule_2_pyridone_ring_aromatic_carbonyl_stays_double():
    symbols, edges = parse_smiles("O=C1C=CC=CN1")
    assert formula(symbols) == {"C": 5, "N": 1, "O": 1, "H": 5}
    assert sum(1 for t in bond_types(edges) if t == 4) == 6
    assert (0, 2, 1) in edges or (1, 2, 0) in edges  # exocyclic C=O kept


def test_antiaromatic_and_saturated_rings_stay_kekule():
    # cyclobutadiene: 4 pi electrons, not 4n+2
    assert 4 not in bond_types(parse_smiles("C1=CC=C1")[1])
    # cyclohexene: saturated ring atoms
    assert 4 not in bond_types(parse_smiles("C1=CCCCC1")[1])
    # fulvene: exocyclic C=C disqualifies
    assert 4 not in bond_types(parse_smiles("C=C1C=CC=C1")[1])
    # acyclic dienes untouched
    assert 4 not in bond_types(parse_smiles("C=CC=C")[1])


# ---------------------------------------------------------------- invariants


def test_valence_bounds_over_qm9_like_corpus():
    corpus = ["C", "N", "O", "CCO", "CC(=O)O", "c1ccccc1", "c1ccncc1",
              "c1cc[nH]c1", "c1ccoc1", "CC#N", "O=C=O", "C1CC1",
              "FC(F)F", "CC(C)C", "C/C=C/C", "N#Cc1ccccc1",
              "OCC1OC1", "Cn1cccc1"]
    max_valence = {"H": 1, "C": 4, "N": 3, "O": 2, "F": 1}
    for s in corpus:
        symbols, edges = parse_smiles(s)
        # Kekulized lower bound: aromatic bonds count 1 (a pyrrole-type
        # N donates its lone pair to the ring, so its 1.5-order sum
        # legitimately exceeds 3 — rdkit models it the same way).
        for idx, d in enumerate(degree_sums(symbols, edges, 1.0)):
            sym = symbols[idx]
            assert d <= max_valence[sym] + 1e-9, (s, idx, sym, d)
            if sym == "H":
                assert d == 1.0, (s, idx)


def test_errors():
    with pytest.raises(SmilesError):
        parse_smiles("C1CC")          # unclosed ring
    with pytest.raises(SmilesError):
        parse_smiles("C(C")           # unclosed branch
    with pytest.raises(SmilesError):
        parse_smiles("CX")            # unknown atom
    with pytest.raises(SmilesError):
        parse_smiles("C=1CCCCC#1")    # conflicting ring bond orders
    with pytest.raises(SmilesError):
        parse_smiles("1CC1")          # ring digit before any atom
    with pytest.raises(SmilesError):
        smiles_to_graph("C[Si](C)C")  # outside the QM9 one-hot set


# ------------------------------------------------------- qm9.py integration


def test_qm9_falls_back_to_builtin_without_rdkit():
    """In this environment rdkit is absent, so qm9.smiles_to_graph's
    "auto" backend must produce the builtin parser's output in the
    reference schema (the same formaldehyde case the stub-rdkit test
    in test_qm9.py pins)."""
    nodes, edges = qm9.smiles_to_graph("C=O")
    assert nodes == [
        [0, 1, 0, 0, 0],   # C
        [0, 0, 0, 1, 0],   # O
        [1, 0, 0, 0, 0],   # H
        [1, 0, 0, 0, 0],   # H
    ]
    assert sorted(tuple(e) for e in edges) == [(0, 1, 2), (0, 1, 3),
                                               (0, 2, 1)]


def test_qm9_backend_selection():
    nodes, edges = qm9.smiles_to_graph("C", backend="builtin")
    assert len(nodes) == 5
    with pytest.raises(ValueError):
        qm9.smiles_to_graph("C", backend="nope")
    try:
        import rdkit  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            qm9.smiles_to_graph("C", backend="rdkit")
