"""Minimal SMILES parser for the functional-group vocabulary.

Covers the restricted grammar of the 25-motif vocabulary (aromatic
lowercase atoms, brackets with charges/H-counts, ring-closure digits,
branches, -=# bonds). Not a general SMILES engine — the FG motifs are the
only in-framework consumers (reference code relies on RDKit here).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from ..constants.molecule import SYMBOL_TO_Z


def parse_smiles(s: str):
    """-> (atomic_numbers, bonds {(i,j): order 1/2/3/4}, aromatic flags)."""
    z: List[int] = []
    aromatic: List[bool] = []
    bonds: Dict[Tuple[int, int], int] = {}
    ring_open: Dict[str, Tuple[int, int]] = {}
    stack: List[int] = []
    prev = -1
    pending_order = None
    i = 0

    def add_bond(a, b, order):
        if a == b or a < 0 or b < 0:
            return
        key = (min(a, b), max(a, b))
        bonds[key] = order

    def new_atom(sym: str, arom: bool):
        nonlocal prev, pending_order
        idx = len(z)
        z.append(SYMBOL_TO_Z.get(sym.capitalize(), 6))
        aromatic.append(arom)
        if prev >= 0:
            order = pending_order if pending_order else (
                4 if arom and aromatic[prev] else 1)
            add_bond(prev, idx, order)
        pending_order = None
        prev = idx
        return idx

    while i < len(s):
        ch = s[i]
        if ch == "(":
            stack.append(prev)
            i += 1
        elif ch == ")":
            prev = stack.pop()
            i += 1
        elif ch in "-=#:":
            pending_order = {"-": 1, "=": 2, "#": 3, ":": 4}[ch]
            i += 1
        elif ch == "[":
            j = s.index("]", i)
            body = s[i + 1:j]
            sym = ""
            for c in body:
                if c.isalpha():
                    sym += c
                    if len(sym) == 2:
                        break
                else:
                    break
            if len(sym) == 2 and sym.capitalize() not in ("Cl", "Br", "Se", "Si"):
                sym = sym[0]
            arom = sym[0].islower()
            new_atom(sym, arom)
            i = j + 1
        elif ch.isdigit():
            idx = prev
            if ch in ring_open:
                a, order_hint = ring_open.pop(ch)
                order = pending_order or order_hint or (
                    4 if aromatic[a] and aromatic[idx] else 1)
                add_bond(a, idx, order)
                pending_order = None
            else:
                ring_open[ch] = (idx, pending_order)
                pending_order = None
            i += 1
        elif ch.isalpha():
            if s[i:i + 2] in ("Cl", "Br"):
                new_atom(s[i:i + 2], False)
                i += 2
            else:
                new_atom(ch, ch.islower())
                i += 1
        else:
            i += 1
    return z, bonds, aromatic
