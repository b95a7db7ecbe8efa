"""Valence-aware pose projection onto the stability distance tables.

Diffusion-family output goes straight to reconstruction; the resulting
poses carry bond lengths a few hundredths of an A outside the windows the
reference's stability check derives bond orders from
(/root/reference/repo/tools/geometry/eval_stability.py:9-44: order(d) via
the BONDS1/2/3 lookup tables, atom stable iff 0 < sum(order) <= valence).
A pose whose PERCEIVED bond graph is chemically fine can still read as
unstable when a single-bond distance dips under the order-2 threshold or
a non-bonded pair sneaks under the order-1 threshold.

This module projects positions so that every assigned bond's distance
lands inside its order's window (targets = the table equilibrium values)
and every non-bonded pair clears the order-0 boundary — a small
least-squares nudge (typically < 0.1 A per atom) that leaves the bond
graph, ring geometry and the pocket pose intact. Gauss-Newton on

    L = sum_bonds (d_ij - t_ij)^2
      + sum_nonbonded max(0, lb_ij - d_ij)^2
      + anchor * sum_i |p_i - p0_i|^2

with vectorized numpy gradient steps (molecules are < 100 atoms; this is
microseconds per molecule).

Flag-gated in sample_cli as --project_stable (off by default so existing
artifacts stay reproducible).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..tools.geometry import (_ALLOWED, _BONDS1, _BONDS2, _BONDS3,
                              _MARGIN1, _MARGIN2, _MARGIN3, _SYM)
from .mol import Molecule

__all__ = ["project_stable_pose", "bond_target_window"]


def bond_target_window(s1: str, s2: str, order: int
                       ) -> Tuple[float, float, float]:
    """(target, lower, upper) distance in A for an assigned bond order
    between element symbols, derived from the stability tables so the
    projected distance round-trips through _bond_order to the assigned
    order (aromatic (4) targets the single-bond window: the stability
    check has no 1.5 notion, and two ring bonds reading as singles keeps
    every aromatic atom under its valence cap)."""
    b1 = _BONDS1.get(s1, {}).get(s2)
    if b1 is None:                      # exotic pair: no table, no window
        return 1.5, 0.0, np.inf
    b2 = _BONDS2.get(s1, {}).get(s2, -np.inf)
    b3 = _BONDS3.get(s1, {}).get(s2, -np.inf)
    up1 = b1 + _MARGIN1
    up2 = b2 + _MARGIN2
    up3 = b3 + _MARGIN3
    if order == 3 and np.isfinite(b3):
        lo, hi, tgt = 0.0, up3, b3
    elif order == 2 and np.isfinite(b2):
        lo, hi, tgt = max(up3, 0.0), up2, max(b2, up3 + 1.0)
    elif order == 4 and np.isfinite(b2):
        # aromatic: aim just above the order-2 boundary (C-C: 1.42 A,
        # near the empirical 1.39) so it reads as a clean single
        lo, hi, tgt = max(up2, 0.0), up1, up2 + 3.0
    else:                               # single (or fallbacks)
        lo, hi, tgt = max(up2, 0.0), up1, max(b1, up2 + 2.0)
        if not np.isfinite(b2):
            lo = 0.0
    # pm -> A; pad the window edges by 1 pm so boundary floats don't flip
    return tgt / 100.0, (lo + 1.0) / 100.0, (hi - 1.0) / 100.0


def project_stable_pose(mol: Molecule, n_iter: int = 150,
                        step: float = 0.2, anchor: float = 0.02,
                        nb_pad: float = 0.03,
                        rec_pos=None, rec_clear: float = 3.25,
                        restore_bonds: bool = False) -> Molecule:
    """Return a copy of ``mol`` with positions projected onto the
    stability windows of its assigned bond graph. Bonds, elements and
    atom order are unchanged; positions move by a few hundredths of an A.

    nb_pad: extra clearance (A) demanded beyond the order-1 boundary for
    non-bonded pairs.

    rec_pos: optional receptor atom positions — adds a clearance hinge
    (distance >= rec_clear, the evaluator's vdW clash band upper bound,
    chem.declash.CLEAR_DIST) INTO the same least-squares solve. This is
    the measured-correct composition of --project_stable + --declash:
    solving stability and protein clearance jointly reaches both at once
    (q2d 200-mol sweep: mol_stable 0.98 / clash 0.00 at anchor 0.005),
    where sequential project-then-SHAKE lost stability to bond-restore
    drift (0.59) and SHAKE-then-project re-entered the pocket (clash
    0.94, results/q4_flag_steric3). When rec_pos is given the defaults
    tighten to n_iter=600 / anchor=0.005 unless the caller overrides.

    restore_bonds: bond targets become clip(d0, lo, hi) — the
    GENERATOR's own length clamped into the stability window — and the
    bond pull applies at every iteration, not only when a bond exits
    its window. Without it, in-window bonds drift freely under the
    clearance/nonbond pushes and the artifact pays a bond-length JSD
    cost (q5_flagship: +0.04); with it, the SHAKE insight (restoring to
    the generator's lengths keeps JSD_BL at raw, results/q4_*_shake)
    carries into the joint solve. Violating bonds get the minimal-move
    window-edge target (measured equivalent to center targets)."""
    n = mol.num_atoms
    if n < 2:
        return mol
    if rec_pos is not None:
        # joint-solve defaults (see docstring); explicit args still win
        if n_iter == 150:
            n_iter = 600
        if anchor == 0.02:
            anchor = 0.005
    pos0 = np.asarray(mol.pos, float)
    syms = mol.symbols()

    bi, bj, tgt, blo, bhi = [], [], [], [], []
    bonded = np.zeros((n, n), bool)
    for (i, j), cls in mol.bonds.items():
        t, lo, hi = bond_target_window(syms[i], syms[j], int(cls))
        bi.append(i)
        bj.append(j)
        tgt.append(t)
        blo.append(lo)
        bhi.append(hi)
        bonded[i, j] = bonded[j, i] = True
    bi = np.asarray(bi, int)
    bj = np.asarray(bj, int)
    tgt = np.asarray(tgt, float)
    blo = np.asarray(blo, float)
    bhi = np.asarray(bhi, float)
    if restore_bonds and len(bi):
        d0 = np.linalg.norm(pos0[bi] - pos0[bj], axis=-1)
        tgt = np.clip(d0, blo, np.where(np.isfinite(bhi), bhi, d0))

    # non-bonded lower bounds: the order-1 threshold for the pair + pad
    lb = np.zeros((n, n), float)
    for a in range(n):
        for b in range(a + 1, n):
            if bonded[a, b]:
                continue
            b1 = _BONDS1.get(syms[a], {}).get(syms[b])
            if b1 is not None:
                lb[a, b] = lb[b, a] = (b1 + _MARGIN1) / 100.0 + nb_pad
    np.fill_diagonal(bonded, True)      # exclude self-pairs below

    rec = None
    if rec_pos is not None:
        rec = np.asarray(rec_pos, float)
        # only receptor atoms near the ligand's bounding box matter
        near = (np.abs(rec - pos0.mean(0))
                < (np.abs(pos0 - pos0.mean(0)).max(0) + 8.0)).all(1)
        rec = rec[near]
        if rec.size == 0:
            rec = None

    pos = pos0.copy()
    eye = np.eye(n, dtype=bool)
    for _ in range(n_iter):
        grad = np.zeros_like(pos)
        # bonds: pull toward target only when outside [lo, hi]
        dv = pos[bi] - pos[bj]
        d = np.linalg.norm(dv, axis=-1)
        d = np.maximum(d, 1e-6)
        if restore_bonds:
            err = d - tgt
        else:
            err = np.where((d < blo) | (d > bhi), d - tgt, 0.0)
        g = (err / d)[:, None] * dv
        np.add.at(grad, bi, g)
        np.add.at(grad, bj, -g)
        # non-bonded: push apart when under the lower bound
        diff = pos[:, None] - pos[None, :]
        dm = np.linalg.norm(diff, axis=-1)
        dm = np.where(eye, np.inf, np.maximum(dm, 1e-6))
        viol = np.where(~bonded & (dm < lb), dm - lb, 0.0)
        grad += np.sum((viol / dm)[..., None] * diff, axis=1)
        # receptor clearance hinge (joint declash)
        if rec is not None:
            rdiff = pos[:, None] - rec[None]
            rd = np.maximum(np.linalg.norm(rdiff, axis=-1), 1e-6)
            rviol = np.where(rd < rec_clear, rd - rec_clear, 0.0)
            grad += np.sum((rviol / rd)[..., None] * rdiff, axis=1)
        # anchor to the sampled pose
        grad += anchor * (pos - pos0)
        if float(np.abs(grad).max()) < 1e-5:
            break
        pos = pos - step * grad

    out = Molecule(mol.atomic_numbers.copy(), pos,
                   bonds=dict(mol.bonds),
                   aromatic=(None if mol.aromatic is None
                             else mol.aromatic.copy()),
                   name=mol.name)
    return out
