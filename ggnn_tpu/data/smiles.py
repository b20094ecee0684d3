"""Dependency-free SMILES -> molecular-graph parser (rdkit fallback).

The reference's QM9 extraction (get_data.py:63-73) needs exactly one
thing from rdkit: `MolFromSmiles` + `AddHs` + the bond/atom iteration
that yields `(begin, bond_type, end)` edges and one-hot [H,C,N,O,F]
nodes. This module implements that capability surface for the SMILES
subset QM9 uses (neutral organic molecules, atoms H/C/N/O/F, up to 9
heavy atoms, aromatic rings), so `ggnn-tpu-get-data` runs with zero
third-party chemistry dependencies. When rdkit IS installed,
data/qm9.py prefers it; this parser is the fallback.

Semantics follow the OpenSMILES specification:

  * organic-subset atoms (`B C N O S P F Cl Br I` and aromatic
    `b c n o s p`) receive implicit hydrogens up to the smallest
    "normal valence" >= the sum of their bond orders; for AROMATIC
    atoms each aromatic bond counts 1 plus one unit for the π system,
    capped at the lowest normal valence with no promotion — rdkit's
    model (aromatic C with two ring bonds carries one H, with three
    ring bonds or any substituent none; `Cn1cccc1`'s N carries none);
  * bracket atoms (`[nH]`, `[C@@H]`, `[13C]`, `[O-]`) carry EXACTLY
    the hydrogen count written in the bracket (default 0); isotopes,
    tetrahedral stereo marks and charges are parsed and ignored for
    the graph topology (charge shifts the valence table by its sign,
    matching rdkit's H-count for e.g. `[NH4+]` written without an
    explicit count — canonical SMILES always writes the count, so
    this is belt-and-braces);
  * an unspecified bond is aromatic when both endpoints are aromatic,
    single otherwise; `/` and `\\` are single bonds (cis/trans marks
    do not change topology); ring-closure bonds may carry their bond
    symbol on either (or both, consistently) ends;
  * hydrogens are materialised as graph nodes the way rdkit's
    `AddHs` does: appended after all heavy atoms, grouped by their
    parent atom in index order, one single bond each.

Bond types match the reference's `bond_dict` (get_data.py:62):
SINGLE 1, DOUBLE 2, TRIPLE 3, AROMATIC 4.

Verification: rdkit cannot run in this environment, so the test
oracle (tests/test_smiles.py) is hand-derived chemistry for molecules
whose structure is unambiguous (methane, ethanol, benzene, pyridine,
pyrrole, furan, acetic acid, acetonitrile, CO2, cyclopropane, ...),
plus structural invariants (valence bounds, symmetry) over the whole
grammar surface.
"""

from typing import Dict, List, Optional, Tuple

SINGLE, DOUBLE, TRIPLE, AROMATIC = 1, 2, 3, 4

_BOND_CHARS = {"-": SINGLE, "=": DOUBLE, "#": TRIPLE, ":": AROMATIC,
               "/": SINGLE, "\\": SINGLE}
# Integer orders for the WRITTEN (non-aromatic) bonds; aromatic bonds
# are counted separately (n_aromatic), so no 1.5 entry is needed.
_BOND_ORDER = {SINGLE: 1, DOUBLE: 2, TRIPLE: 3}

# OpenSMILES "normal valences" for the organic subset.
_NORMAL_VALENCES = {
    "B": (3,), "C": (4,), "N": (3, 5), "O": (2,), "P": (3, 5),
    "S": (2, 4, 6), "F": (1,), "Cl": (1,), "Br": (1,), "I": (1,),
    "H": (1,),
}
_ORGANIC_ALIPHATIC = ("Cl", "Br", "B", "C", "N", "O", "S", "P", "F", "I")
_ORGANIC_AROMATIC = ("b", "c", "n", "o", "s", "p")
_BRACKET_SYMBOLS = tuple(sorted(
    list(_NORMAL_VALENCES) + list(_ORGANIC_AROMATIC) + ["*"],
    key=len, reverse=True))


class SmilesError(ValueError):
    pass


class _Atom:
    __slots__ = ("symbol", "aromatic", "explicit_h", "charge")

    def __init__(self, symbol: str, aromatic: bool,
                 explicit_h: Optional[int], charge: int):
        self.symbol = symbol          # canonical capitalisation ("C", "Cl")
        self.aromatic = aromatic
        self.explicit_h = explicit_h  # None => implicit (organic subset)
        self.charge = charge


def _parse_bracket(s: str, i: int) -> Tuple[_Atom, int]:
    """Parse a bracket atom starting at s[i] == '['; return (atom, next i)."""
    j = s.find("]", i)
    if j < 0:
        raise SmilesError(f"unterminated bracket atom at {i} in {s!r}")
    body, k = s[i + 1:j], 0
    # isotope
    while k < len(body) and body[k].isdigit():
        k += 1
    sym = None
    for cand in _BRACKET_SYMBOLS:
        if body[k:k + len(cand)] == cand:
            sym = cand
            k += len(cand)
            break
    if sym is None:
        raise SmilesError(f"unknown atom symbol in [{body}]")
    aromatic = sym.islower()
    symbol = sym.capitalize() if sym != "*" else "*"
    # tetrahedral stereo
    while k < len(body) and body[k] == "@":
        k += 1
    if body[k:k + 2] in ("TH", "AL", "SP", "TB", "OH"):  # extended chirality
        k += 2
        while k < len(body) and body[k].isdigit():
            k += 1
    h_count = 0
    if k < len(body) and body[k] == "H":
        k += 1
        h_count = 1
        if k < len(body) and body[k].isdigit():
            h_count = int(body[k])
            k += 1
    charge = 0
    while k < len(body) and body[k] in "+-":
        sign = 1 if body[k] == "+" else -1
        k += 1
        if k < len(body) and body[k].isdigit():
            charge += sign * int(body[k])
            k += 1
        else:
            charge += sign
    if k < len(body) and body[k] == ":":  # atom-map number
        k += 1
        while k < len(body) and body[k].isdigit():
            k += 1
    if k != len(body):
        raise SmilesError(f"trailing characters in [{body}]")
    return _Atom(symbol, aromatic, h_count, charge), j + 1


def _implicit_h(atom: _Atom, plain_sum: int, n_aromatic: int) -> int:
    """`plain_sum` is the integer bond-order sum of the atom's
    NON-aromatic bonds; `n_aromatic` its aromatic-bond count.

    Only ORGANIC-subset atoms reach the valence table: every bracket
    atom carries an explicit H count (possibly 0 — SMILES semantics:
    brackets suppress implicit H) and returns at the first check, which
    is also why no charge handling exists here — charge is only ever
    parsed inside brackets (round-5 review removed an unreachable
    charge-shift branch that misdocumented this)."""
    if atom.explicit_h is not None:
        return atom.explicit_h
    valences = _NORMAL_VALENCES.get(atom.symbol)
    if valences is None:
        return 0
    if atom.aromatic and n_aromatic > 0:
        # rdkit's aromatic model: each aromatic bond counts 1 plus ONE
        # unit for the π system, capped at the LOWEST normal valence —
        # no promotion (so `Cn1cccc1`'s nitrogen gets 0 H, not the
        # N(V) answer the 1.5-per-bond accounting would give).
        need = plain_sum + n_aromatic + 1
        return max(0, valences[0] - need)
    need = plain_sum + n_aromatic
    for v in valences:
        if v >= need:
            return v - need
    return 0


def _simple_cycles(adj: List[List[int]], n: int, max_len: int,
                   cap: int = 5000) -> List[List[int]]:
    """All simple cycles up to max_len, each reported once (anchored at
    its smallest vertex, direction fixed)."""
    cycles: List[List[int]] = []
    for s in range(n):
        stack = [(s, [s])]
        while stack and len(cycles) < cap:
            v, path = stack.pop()
            for u in adj[v]:
                if u == s and len(path) >= 3:
                    if path[1] < path[-1]:
                        cycles.append(path)
                elif u > s and u not in path and len(path) < max_len:
                    stack.append((u, path + [u]))
    return cycles


def _perceive_aromaticity(atoms: List[_Atom],
                          edges: List[Tuple[int, int, int]],
                          h_counts: List[int]) -> List[Tuple[int, int, int]]:
    """Retype Kekulé-form aromatic rings to AROMATIC bonds, the way
    rdkit's sanitization would before the reference reads GetBondType()
    (get_data.py:64-69). Hückel electron counting per simple ring:

      * an atom double-bonded to another atom of the ring contributes 1;
      * a lone-pair donor with only single bonds (N/P with 3 total
        connections incl. implicit H, O/S with 2) contributes 2;
      * an exocyclic double bond to an atom of ANOTHER ring (fused
        systems) or to a non-ring O/N (2-pyridone-style) contributes 0;
        to a non-ring carbon (fulvene) it disqualifies the ring;
      * saturated or triple-bonded ring atoms disqualify the ring;
      * aromatic iff the count is 4n+2.

    A second pass marks ring bonds between two perceived-aromatic atoms
    (the fusion bond of a bicyclic whose envelope, not its sub-rings,
    satisfied Hückel). Rings already written in aromatic form pass
    through untouched. Deliberately NOT a full rdkit aromaticity model
    — it covers the neutral H/C/N/O/F chemistry QM9 contains; rdkit
    stays authoritative for exotic rings when installed."""
    n = len(atoms)
    if not any(t == DOUBLE for _, t, _ in edges):
        return edges
    adj: List[List[int]] = [[] for _ in range(n)]
    etype: Dict[Tuple[int, int], int] = {}
    double_partners: List[List[int]] = [[] for _ in range(n)]
    triple_at = [False] * n
    degree = [0] * n
    for a, t, b in edges:
        adj[a].append(b)
        adj[b].append(a)
        etype[(min(a, b), max(a, b))] = t
        degree[a] += 1
        degree[b] += 1
        if t == DOUBLE:
            double_partners[a].append(b)
            double_partners[b].append(a)
        elif t == TRIPLE:
            triple_at[a] = triple_at[b] = True

    rings = _simple_cycles(adj, n, max_len=min(n, 12))
    in_any_ring = set()
    for ring in rings:
        in_any_ring.update(ring)

    aromatic_atoms = {i for i in range(n) if atoms[i].aromatic}
    new_aromatic: set = set()
    for ring in rings:
        ring_set = set(ring)
        ring_bonds = [(min(a, b), max(a, b))
                      for a, b in zip(ring, ring[1:] + ring[:1])]
        # only perceive fully Kekulé-written rings
        if any(etype[e] not in (SINGLE, DOUBLE) for e in ring_bonds):
            continue
        pi, ok = 0, True
        for v in ring:
            if triple_at[v]:
                ok = False
                break
            partners = double_partners[v]
            if any(u in ring_set for u in partners):
                pi += 1
            elif partners:
                exo = partners[0]
                if exo in in_any_ring or atoms[exo].symbol in ("O", "N", "S"):
                    pass                      # contributes 0, stays eligible
                else:
                    ok = False                # fulvene-style exocyclic C=C
                    break
            else:
                sym = atoms[v].symbol
                conn = degree[v] + h_counts[v]
                if sym in ("N", "P") and conn == 3:
                    pi += 2
                elif sym in ("O", "S") and conn == 2:
                    pi += 2
                else:
                    ok = False                # saturated ring atom
                    break
        if ok and pi % 4 == 2:
            new_aromatic.update(ring_bonds)
            aromatic_atoms.update(ring_set)
    if not new_aromatic:
        return edges
    # fusion bonds between two perceived-aromatic atoms
    for ring in rings:
        for e in ((min(a, b), max(a, b))
                  for a, b in zip(ring, ring[1:] + ring[:1])):
            if (etype[e] in (SINGLE, DOUBLE)
                    and e[0] in aromatic_atoms and e[1] in aromatic_atoms):
                new_aromatic.add(e)
    return [(a, AROMATIC if (min(a, b), max(a, b)) in new_aromatic else t, b)
            for a, t, b in edges]


def parse_smiles(smiles: str) -> Tuple[List[str], List[Tuple[int, int, int]]]:
    """Parse SMILES into (atom symbols incl. materialised H,
    edges as (begin, bond_type, end)); see module docstring."""
    atoms: List[_Atom] = []
    bonds: List[Tuple[int, int, Optional[int]]] = []  # (a, b, type|None)
    branch_stack: List[int] = []
    ring_open: Dict[str, Tuple[int, Optional[int]]] = {}
    prev: Optional[int] = None
    pending_bond: Optional[int] = None
    i, n = 0, len(smiles)

    def add_atom(atom: _Atom):
        nonlocal prev, pending_bond
        atoms.append(atom)
        idx = len(atoms) - 1
        if prev is not None:
            bonds.append((prev, idx, pending_bond))
        prev = idx
        pending_bond = None

    def close_ring(label: str):
        nonlocal pending_bond
        if prev is None:
            raise SmilesError(f"ring bond {label} before any atom")
        if label in ring_open:
            a, b1 = ring_open.pop(label)
            b2 = pending_bond
            if b1 is not None and b2 is not None and b1 != b2:
                raise SmilesError(f"conflicting bond orders on ring {label}")
            if a == prev:
                raise SmilesError(f"ring {label} closes on its own atom")
            if any((x == a and y == prev) or (x == prev and y == a)
                   for x, y, _t in bonds):
                # rdkit errors on this too ('C1C1'): a closure that
                # duplicates an existing bond would emit parallel edges
                # and double-count in-degrees downstream.
                raise SmilesError(
                    f"ring {label} duplicates an existing bond")
            bonds.append((a, prev, b1 if b1 is not None else b2))
        else:
            ring_open[label] = (prev, pending_bond)
        pending_bond = None

    while i < n:
        c = smiles[i]
        if c == "[":
            atom, i = _parse_bracket(smiles, i)
            add_atom(atom)
        elif c == "(":
            if prev is None:
                raise SmilesError("branch before any atom")
            if pending_bond is not None:
                raise SmilesError(f"dangling bond symbol before '(' at {i}")
            branch_stack.append(prev)
            i += 1
        elif c == ")":
            if not branch_stack:
                raise SmilesError("unmatched ')'")
            if pending_bond is not None:
                # 'C(C=)O' must not silently re-type the C-O bond
                # (rdkit rejects the string).
                raise SmilesError(f"dangling bond symbol before ')' at {i}")
            prev = branch_stack.pop()
            i += 1
        elif c in _BOND_CHARS:
            pending_bond = _BOND_CHARS[c]
            i += 1
        elif c == ".":
            if pending_bond is not None:
                raise SmilesError(f"dangling bond symbol before '.' at {i}")
            prev = None
            i += 1
        elif c.isdigit():
            close_ring(c)
            i += 1
        elif c == "%":
            label = smiles[i + 1:i + 3]
            if len(label) != 2 or not label.isdigit():
                raise SmilesError(
                    f"'%' ring label must be two digits, got {label!r} "
                    f"at {i}")
            close_ring(label)
            i += 3
        else:
            matched = False
            for sym in _ORGANIC_ALIPHATIC:
                if smiles[i:i + len(sym)] == sym:
                    add_atom(_Atom(sym, False, None, 0))
                    i += len(sym)
                    matched = True
                    break
            if not matched and c in _ORGANIC_AROMATIC:
                add_atom(_Atom(c.capitalize(), True, None, 0))
                i += 1
                matched = True
            if not matched:
                raise SmilesError(f"unexpected character {c!r} at {i} "
                                  f"in {smiles!r}")
    if ring_open:
        raise SmilesError(f"unclosed ring bonds: {sorted(ring_open)}")
    if branch_stack:
        raise SmilesError("unclosed branch")
    if pending_bond is not None:
        # 'C=' must not silently parse as methane.
        raise SmilesError("dangling bond symbol at end of SMILES")

    # Resolve unspecified bonds: aromatic iff both endpoints aromatic.
    edges: List[Tuple[int, int, int]] = []
    for a, b, t in bonds:
        if t is None:
            t = AROMATIC if atoms[a].aromatic and atoms[b].aromatic else SINGLE
        edges.append((a, t, b))

    # Implicit hydrogens from the WRITTEN bond orders (Kekulé pyrrole's
    # N earns its H from the two written single bonds; rdkit likewise
    # fixes H counts at parse time, before aromaticity perception).
    plain_sum = [0] * len(atoms)
    n_aromatic = [0] * len(atoms)
    for a, t, b in edges:
        if t == AROMATIC:
            n_aromatic[a] += 1
            n_aromatic[b] += 1
        else:
            plain_sum[a] += _BOND_ORDER[t]
            plain_sum[b] += _BOND_ORDER[t]
    h_counts = [_implicit_h(atom, plain_sum[i], n_aromatic[i])
                for i, atom in enumerate(atoms)]

    # Kekulé-form aromatic rings -> AROMATIC bond type (what rdkit's
    # sanitization does to the reference's graphs, get_data.py:64-69).
    edges = _perceive_aromaticity(atoms, edges, h_counts)

    # AddHs-style materialisation: hydrogens appended after the heavy
    # atoms, grouped by parent in index order.
    symbols = [a.symbol for a in atoms]
    for idx in range(len(atoms)):
        for _ in range(h_counts[idx]):
            symbols.append("H")
            edges.append((idx, SINGLE, len(symbols) - 1))
    return symbols, edges


def smiles_to_graph(smiles: str,
                    atom_symbols: Tuple[str, ...] = ("H", "C", "N", "O", "F")):
    """get_data.py:63-73-shaped output from the built-in parser:
    (one-hot nodes over `atom_symbols`, edges (begin, type, end))."""
    symbols, edges = parse_smiles(smiles)
    nodes = []
    for s in symbols:
        if s not in atom_symbols:
            raise SmilesError(
                f"atom {s!r} outside the supported set {atom_symbols} "
                f"(QM9 contains only H/C/N/O/F; install rdkit for "
                f"general chemistry)")
        nodes.append([1 if s == a else 0 for a in atom_symbols])
    return nodes, [list(e) for e in edges]
