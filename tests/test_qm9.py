"""QM9 extraction-pipeline tests (the rdkit/network-free parts).

Real QM9 extraction needs the figshare tarball and rdkit, neither of
which exist in this environment; what CAN be verified hermetically is
everything around the SMILES->graph call (get_data.py semantics):
  * .xyz parsing — SMILES from lines[-2], mu from property column 4 of
    line 2 (get_data.py:28-35, INDEX_OF_MU=4);
  * the train/valid split by the vendored valid_idx.json id set
    (get_data.py:37-39);
  * mu normalized by the TRAIN split's mean/std only (get_data.py:51-56);
  * output JSON schema {targets, graph, node_features}
    (get_data.py:82-86).
"""

import json
import os

import numpy as np
import pytest

from ggnn_tpu.data import qm9


def _write_xyz(path, n_atoms, mu, smiles):
    """dsgdb9nsd_*.xyz layout: natoms / tab-separated properties (mu at
    column 4) / one line per atom / frequencies / SMILES line / InChI."""
    props = ["gdb", "1", "2", "3", str(mu), "5", "6"]
    lines = [str(n_atoms), "\t".join(props)]
    lines += [f"C\t0.0\t0.0\t{i}.0\t0.0" for i in range(n_atoms)]
    lines += ["100.0\t200.0", f"{smiles}\t{smiles}", "InChI=1S/fake"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_read_xyz_extracts_smiles_and_mu(tmp_path):
    p = tmp_path / "dsgdb9nsd_000001.xyz"
    _write_xyz(str(p), 3, 2.5, "CCO")
    out = qm9.read_xyz(str(p))
    assert out == {"smiles": "CCO", "mu": 2.5}


def test_vendored_valid_idx_matches_reference_split():
    """The vendored asset must be the reference's exact 13,082-id split
    (valid_idx.json, loaded at get_data.py:37-39)."""
    ids = qm9.load_valid_idx()
    assert len(ids) == 13082
    assert all(isinstance(i, str) for i in ids)


def test_preprocess_split_and_train_only_normalization(tmp_path, monkeypatch):
    raw = tmp_path / "qm9_raw"
    raw.mkdir()
    # Four molecules; ids 2 and 4 go to valid.
    mus = {"000001": 1.0, "000002": 5.0, "000003": 3.0, "000004": 9.0}
    for mol_id, mu in mus.items():
        _write_xyz(str(raw / f"dsgdb9nsd_{mol_id}.xyz"), 2, mu,
                   f"SMI{mol_id}")
    split = tmp_path / "valid_idx.json"
    split.write_text(json.dumps({"valid_idxs": ["000002", "000004"]}))

    # rdkit is unavailable here; substitute a deterministic stub so the
    # surrounding pipeline (split, normalization, schema) is exercised.
    def fake_graph(smiles):
        nodes = [[1, 0, 0, 0, 0], [0, 1, 0, 0, 0]]
        edges = [(0, 1, 1)]
        return nodes, edges

    monkeypatch.setattr(qm9, "smiles_to_graph", fake_graph)
    qm9.preprocess(str(raw), valid_idx_path=str(split), out_dir=str(tmp_path))

    with open(tmp_path / "molecules_train.json") as f:
        train = json.load(f)
    with open(tmp_path / "molecules_valid.json") as f:
        valid = json.load(f)
    assert len(train) == 2 and len(valid) == 2

    # Normalization stats come from the TRAIN mus only (1.0, 3.0).
    mean, std = 2.0, 1.0
    train_mus = sorted(t["targets"][0][0] for t in train)
    np.testing.assert_allclose(train_mus, [(1.0 - mean) / std,
                                           (3.0 - mean) / std])
    valid_mus = sorted(t["targets"][0][0] for t in valid)
    np.testing.assert_allclose(valid_mus, [(5.0 - mean) / std,
                                           (9.0 - mean) / std])

    # Schema matches get_data.py:82-86 and is loadable by the framework's
    # own loader/metadata inference.
    from ggnn_tpu.data.loader import infer_metadata
    meta = infer_metadata([train, valid], tie_fwd_bkwd=True)
    assert meta.annotation_size == 5
    for item in train + valid:
        assert set(item) == {"targets", "graph", "node_features"}
        assert item["graph"] == [[0, 1, 1]]


def test_xyz_to_training_end_to_end(tmp_path, monkeypatch):
    """The full reference workflow — get_data.py extraction followed by
    a training run consuming its outputs (README.md usage) — wired
    through this framework: .xyz corpus -> qm9.preprocess ->
    molecules_{train,valid}.json -> Runner(data_dir=...) epoch ->
    predict. rdkit itself is stubbed (unavailable here); everything
    else (parsing, split, normalization, schema, loader, packer,
    training, inference) is the real path.
    """
    from ggnn_tpu.training.config import resolve_config
    from ggnn_tpu.training.runner import Runner

    raw = tmp_path / "qm9_raw"
    raw.mkdir()
    rng = np.random.RandomState(7)
    for i in range(1, 25):
        _write_xyz(str(raw / f"dsgdb9nsd_{i:06d}.xyz"), 3,
                   float(rng.uniform(-2, 8)), f"SMI{i:06d}")
    split = tmp_path / "valid_idx.json"
    split.write_text(json.dumps(
        {"valid_idxs": [f"{i:06d}" for i in range(19, 25)]}))

    def fake_graph(smiles):
        # Deterministic per-molecule shape variety: a path graph of
        # 3..8 atoms with alternating bond types.
        n = 3 + int(smiles[-2:]) % 6
        nodes = [[1 if j == (i % 5) else 0 for j in range(5)]
                 for i in range(n)]
        edges = [(i, 1 + i % 3, i + 1) for i in range(n - 1)]
        return nodes, edges

    monkeypatch.setattr(qm9, "smiles_to_graph", fake_graph)
    qm9.preprocess(str(raw), valid_idx_path=str(split),
                   out_dir=str(tmp_path))

    cfg = resolve_config(
        "sparse", None,
        '{"num_epochs": 1, "hidden_size": 8, "patience": 2}')
    runner = Runner("sparse", cfg, data_dir=str(tmp_path),
                    log_dir=str(tmp_path / "logs"),
                    quiet=True, tensorboard=False)
    log = runner.train()
    assert len(log) == 1
    assert np.isfinite(log[0]["train_results"][0])
    assert np.isfinite(log[0]["valid_results"][0])
    outs = runner.predict(json.loads(
        (tmp_path / "molecules_valid.json").read_text())[:3])
    total = np.concatenate([np.asarray(o) for o in outs], axis=1)
    assert total.shape == (1, 3) and np.isfinite(total).all()


def _qm9_like_smiles():
    """A few hundred deterministic SMILES spanning QM9's chemistry
    (neutral H/C/N/O/F molecules: chains, branches, carbonyls,
    nitriles, alkenes/alkynes, saturated and aromatic rings)."""
    subs = ["C", "CC", "CCC", "O", "OC", "N", "NC", "F", "C#N", "C=C",
            "C#C", "C(=O)C", "C(=O)O", "C(=O)N", "C(F)(F)F", "CO", "CN",
            "C(C)O", "C(N)C"]
    bases = ["C{}", "CC{}", "CCC{}", "CCCC{}", "CC(C){}", "C(C)(C){}",
             "OC{}", "OCC{}", "NC{}", "NCC{}", "FC{}", "C=CC{}",
             "C(=O){}", "CC(=O){}", "C1CC1{}", "C1CCC1{}", "C1CCCC1{}",
             "C1CCCCC1{}", "C1CCOC1{}", "C1CCNC1{}", "C1COC1{}",
             "c1ccccc1{}", "Cc1ccccc1{}"]
    named = [
        "C", "N", "O", "C#N", "C=O", "O=C=O", "C1CC1", "C1CCC1",
        "C1CCCC1", "C1CCCCC1", "C1CCOC1", "C1CCOCC1", "C1CCNC1",
        "C1CCNCC1", "C1COC1", "C1CNC1", "C1OCO1", "c1ccccc1",
        "c1ccncc1", "c1cncnc1", "c1ccoc1", "c1cc[nH]c1", "c1c[nH]cn1",
        "c1cnco1", "c1cnc[nH]1", "Fc1ccccc1", "Nc1ccccc1", "Oc1ccccc1",
        "Cc1ccncc1", "CC(N)C(=O)O", "NC(=O)c1ccccc1", "OCC(O)CO",
        "NCCN", "OCCO", "FC(F)F", "C/C=C/C", "C/C=C\\C", "CC(C)(C)C",
        "N#CC#N", "OC(=O)C(=O)O", "CN(C)C", "CC(=O)OC", "COC=O",
        "C1=CC=CC=C1", "C1=CCCCC1", "C1=CNC=C1",
    ]
    corpus = [b.format(s) for b in bases for s in subs] + named
    return list(dict.fromkeys(corpus))  # dedupe, keep order


def test_smiles_builtin_matches_rdkit_differential():
    """Builtin parser vs real rdkit over the generated QM9-like corpus
    (VERDICT round-3 #4b): identical graphs under get_data.py:63-73
    semantics. Node indices must agree exactly (MolFromSmiles keeps
    SMILES atom order; AddHs appends hydrogens — the builtin mirrors
    both), so node one-hots compare positionally; edges compare as
    canonical undirected (min, type, max) sets — bond direction is
    erased downstream by tie_fwd_bkwd and rdkit's begin/end choice is
    an implementation detail. Skips only where rdkit is absent; the
    builtin half of every molecule still parses under
    test_smiles_generated_corpus_parses below."""
    pytest.importorskip("rdkit", reason="rdkit not installed here")
    for smiles in _qm9_like_smiles():
        nodes_b, edges_b = qm9.smiles_to_graph(smiles, backend="builtin")
        nodes_r, edges_r = qm9.smiles_to_graph(smiles, backend="rdkit")
        assert nodes_b == nodes_r, f"{smiles}: node one-hots differ"
        canon = lambda es: sorted((min(a, c), t, max(a, c))
                                  for a, t, c in es)
        assert canon(edges_b) == canon(edges_r), f"{smiles}: edges differ"


def test_smiles_generated_corpus_parses():
    """The rdkit-free half of the differential, active everywhere: every
    generated molecule parses, yields one-hot [H,C,N,O,F] nodes, bond
    types in 1..4, edge endpoints in range, and every hydrogen appended
    after the heavy atoms with exactly one single bond."""
    corpus = _qm9_like_smiles()
    assert len(corpus) >= 300
    assert len(set(corpus)) == len(corpus)  # generator dedupes
    for smiles in corpus:
        nodes, edges = qm9.smiles_to_graph(smiles, backend="builtin")
        assert nodes and all(sum(n) == 1 for n in nodes), smiles
        n_heavy = sum(1 for n in nodes if n[0] != 1)
        assert all(0 <= a < len(nodes) and 0 <= c < len(nodes)
                   and 1 <= t <= 4 for a, t, c in edges), smiles
        h_bonds = {}
        for a, t, c in edges:
            for v in (a, c):
                if nodes[v][0] == 1:
                    assert t == 1, smiles
                    h_bonds[v] = h_bonds.get(v, 0) + 1
        assert all(h_bonds.get(v, 0) == 1
                   for v in range(n_heavy, len(nodes))), smiles


def test_smiles_to_graph_bond_and_atom_mapping(monkeypatch):
    """Pin smiles_to_graph's rdkit->schema mapping (get_data.py:63-73:
    bond types {SINGLE:1, DOUBLE:2, TRIPLE:3, AROMATIC:4}, one-hot over
    [H,C,N,O,F]) against a stub rdkit modelling formaldehyde C=O +
    AddHs: real rdkit is not installable here, but the mapping logic is
    ours and hermetically testable."""
    import sys
    import types

    class Atom:
        def __init__(self, symbol):
            self._s = symbol

        def GetSymbol(self):
            return self._s

    class Bond:
        def __init__(self, begin, kind, end):
            self._b, self._k, self._e = begin, kind, end

        def GetBeginAtomIdx(self):
            return self._b

        def GetEndAtomIdx(self):
            return self._e

        def GetBondType(self):
            return self._k  # str(kind) is the BOND_DICT key

    class Mol:
        def __init__(self, atoms, bonds):
            self.atoms, self.bonds = atoms, bonds

        def GetAtoms(self):
            return self.atoms

        def GetBonds(self):
            return self.bonds

    heavy = Mol([Atom("C"), Atom("O")], [Bond(0, "DOUBLE", 1)])

    def add_hs(mol):
        return Mol(mol.atoms + [Atom("H"), Atom("H")],
                   mol.bonds + [Bond(0, "SINGLE", 2), Bond(0, "SINGLE", 3)])

    chem = types.SimpleNamespace(
        MolFromSmiles=lambda smiles: heavy, AddHs=add_hs)
    fake_rdkit = types.ModuleType("rdkit")
    fake_rdkit.Chem = chem
    monkeypatch.setitem(sys.modules, "rdkit", fake_rdkit)

    nodes, edges = qm9.smiles_to_graph("C=O")
    assert nodes == [
        [0, 1, 0, 0, 0],   # C
        [0, 0, 0, 1, 0],   # O
        [1, 0, 0, 0, 0],   # H
        [1, 0, 0, 0, 0],   # H
    ]
    assert edges == [(0, 2, 1), (0, 1, 2), (0, 1, 3)]
