"""Native AutoDock Vina *dock* mode (pure numpy, host).

Completes the reference's three-mode Vina protocol (reference:
repo/tools/docking_vina.py:137-151 — score_only / minimize / dock with
exhaustiveness 16; the improvement-ratio headline of
evaluate_scripts/cal_chem_results.py:51-60 is computed from docked
scores). The binary is absent from this image, so this module implements
the search the binary performs over the SAME scoring function already
pinned term-by-term in tools/vina_native.py / tests/test_vina_native.py:

* **Torsion tree** — rotatable bonds (the pdbqt rotor rules of
  vina_native.count_rotatable_bonds) become a kinematic tree rooted at
  the atom that best balances subtree sizes; a conformation is
  (translation, rigid rotation, per-rotor dihedral deltas).
* **Grid maps** — like the binary, the receptor field is precomputed on
  a 3D grid per distinct ligand atom type (radius × hydrophobic ×
  donor × acceptor), so a pose's inter energy is L trilinear
  interpolations instead of L×R pairwise terms. Grids are cached per
  pocket and shared across the ~100 generated molecules scored there.
* **Monte Carlo + local minimize** — ``exhaustiveness`` independent
  runs (one seeded at the input pose, the rest at random placements in
  the search box), each a Metropolis chain of mutate → local-minimize
  steps at the binary's T = 1.2 kcal/mol; the global best pose gets a
  final full minimization and an EXACT pairwise rescoring (shared
  score_only term math — the grid is used for search only).

Reported with ``vina_native_approximate: True`` like score_only: the
typing pipeline differs from meeko/AutoDockTools at the margin, the
intra-molecular term keeps constant rigid-pair contributions (they
cancel in all argmin/Metropolis decisions), and the search budget is
tunable rather than the binary's fixed heuristic schedule.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..chem.mol import Molecule
from .vina_native import (CUTOFF, W_GAUSS1, W_GAUSS2, W_HBOND,
                          W_HYDROPHOBIC, W_REPULSION, W_ROT,
                          count_rotatable_bonds, ligand_typing,
                          pairwise_terms, term_gauss1, term_gauss2,
                          term_hbond, term_hydrophobic, term_repulsion)


# ---------------------------------------------------------------------------
# torsion tree
# ---------------------------------------------------------------------------

def _rotatable_edges(mol: Molecule) -> List[Tuple[int, int]]:
    """The same bonds count_rotatable_bonds counts, as an edge list."""
    ring_edges = set()
    for ring in mol.rings():
        m = len(ring)
        for a in range(m):
            i, j = ring[a], ring[(a + 1) % m]
            ring_edges.add((min(i, j), max(i, j)))
    adj = mol.neighbors()
    z = mol.atomic_numbers
    edges = []
    for (i, j), order in mol.bonds.items():
        if order != 1 or (i, j) in ring_edges:
            continue
        if mol.degree(i) < 2 or mol.degree(j) < 2:
            continue

        def is_amide(c, nn):
            if int(z[c]) != 6 or int(z[nn]) != 7:
                return False
            return any(int(z[k]) == 8
                       and mol.bonds.get((min(c, k), max(c, k))) == 2
                       for k in adj[c])
        if is_amide(i, j) or is_amide(j, i):
            continue
        edges.append((i, j))
    return edges


def build_torsion_tree(mol: Molecule,
                       root: Optional[int] = None
                       ) -> List[Tuple[int, int, np.ndarray]]:
    """Orient rotatable bonds away from a root atom and return
    ``[(a, b, moved)]`` in root-outward order: rotating about the
    current a→b axis moves exactly the atoms in boolean mask ``moved``
    (the b-side of the cut bond). Sequential application parent-first
    reproduces the pdbqt BRANCH kinematics. Root defaults to the atom
    of the largest fragment minimizing the largest moved subtree
    (vina's root choice heuristic)."""
    n = mol.num_atoms
    adj = mol.neighbors()
    edges = _rotatable_edges(mol)
    if not edges:
        return []

    def component(start: int) -> List[int]:
        seen = {start}
        stack = [start]
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        return sorted(seen)

    if root is None:
        comp = max((component(i) for i in
                    {e[0] for e in edges}), key=len)
        best, best_cost = comp[0], n + 1
        for cand in comp:
            # worst-case moved-subtree size when rooted at cand
            worst = 0
            for (i, j) in edges:
                di = _graph_dist_single(adj, cand, i)
                dj = _graph_dist_single(adj, cand, j)
                far = j if dj > di else i
                nearm = i if dj > di else j
                worst = max(worst, int(_bfs_cut(adj, nearm, far).sum()))
            if worst < best_cost:
                best, best_cost = cand, worst
        root = best

    oriented = []
    for (i, j) in edges:
        di = _graph_dist_single(adj, root, i)
        dj = _graph_dist_single(adj, root, j)
        if di == -1:        # different fragment: root at smaller index
            a, b = (i, j) if i < j else (j, i)
        elif di <= dj:
            a, b = i, j
        else:
            a, b = j, i
        moved = _bfs_cut(adj, a, b)
        oriented.append((a, b, moved,
                         di if di >= 0 else 0))
    oriented.sort(key=lambda t: t[3])
    return [(a, b, m) for (a, b, m, _) in oriented]


def _graph_dist_single(adj: List[List[int]], s: int, t: int) -> int:
    if s == t:
        return 0
    from collections import deque
    dist = {s: 0}
    dq = deque([s])
    while dq:
        u = dq.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                if v == t:
                    return dist[v]
                dq.append(v)
    return -1


def _bfs_cut(adj: List[List[int]], a: int, b: int) -> np.ndarray:
    """Boolean mask of atoms reachable from b with edge (a, b) removed."""
    n = len(adj)
    seen = np.zeros(n, bool)
    seen[b] = True
    stack = [b]
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if (u == b and v == a) or (u == a and v == b):
                continue
            if not seen[v]:
                seen[v] = True
                stack.append(v)
    seen[a] = False
    return seen


def _rodrigues(pos: np.ndarray, origin: np.ndarray, axis: np.ndarray,
               angle: float) -> np.ndarray:
    k = axis / max(float(np.linalg.norm(axis)), 1e-12)
    p = pos - origin
    return (p * np.cos(angle) + np.cross(k, p) * np.sin(angle)
            + k[None] * (p @ k)[:, None] * (1 - np.cos(angle))) + origin


def _rodrigues_batch(pos: np.ndarray, origin: np.ndarray, axis: np.ndarray,
                     angle: np.ndarray) -> np.ndarray:
    """Per-pose Rodrigues: pos [P,M,3] about origin [P,3] / axis [P,3] by
    angle [P]. Zero-angle rows pass through exactly."""
    n = np.linalg.norm(axis, axis=-1, keepdims=True)
    k = axis / np.maximum(n, 1e-12)                       # [P,3]
    p = pos - origin[:, None]
    c = np.cos(angle)[:, None, None]
    s = np.sin(angle)[:, None, None]
    kd = np.sum(p * k[:, None], -1, keepdims=True)        # [P,M,1]
    out = (p * c + np.cross(np.broadcast_to(k[:, None], p.shape), p) * s
           + k[:, None] * kd * (1 - c))
    return out + origin[:, None]


def apply_torsions(pos0: np.ndarray,
                   tree: List[Tuple[int, int, np.ndarray]],
                   angles: np.ndarray) -> np.ndarray:
    """Apply dihedral deltas root-outward; axes are re-read from the
    *current* positions so parent rotations correctly reorient child
    axes (BRANCH nesting)."""
    pos = np.array(pos0, float)
    for (a, b, moved), ang in zip(tree, angles):
        if abs(float(ang)) < 1e-12:
            continue
        axis = pos[b] - pos[a]
        pos[moved] = _rodrigues(pos[moved], pos[b], axis, float(ang))
    return pos


# ---------------------------------------------------------------------------
# intra-molecular term (conformation-dependent part of the energy)
# ---------------------------------------------------------------------------

def _graph_distances(mol: Molecule) -> np.ndarray:
    n = mol.num_atoms
    adj = mol.neighbors()
    dist = np.full((n, n), 10 ** 6, int)
    from collections import deque
    for s in range(n):
        dist[s, s] = 0
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if dist[s, v] > dist[s, u] + 1:
                    dist[s, v] = dist[s, u] + 1
                    dq.append(v)
    return dist


class IntraTerm:
    """Vina's intra-molecular interactions: heavy-atom pairs more than
    three bonds apart (1-2/1-3/1-4 excluded), same five terms. Pairs in
    the same rigid unit contribute a pose-independent constant that
    cancels in every comparison the search makes."""

    def __init__(self, mol: Molecule):
        lt = ligand_typing(mol)
        gd = _graph_distances(mol)
        heavy = lt["heavy"]
        n = mol.num_atoms
        ii, jj = np.triu_indices(n, 1)
        keep = (gd[ii, jj] > 3) & heavy[ii] & heavy[jj]
        self.i = ii[keep]
        self.j = jj[keep]
        self.rad_sum = lt["radius"][self.i] + lt["radius"][self.j]
        self.hyd = lt["hydrophobic"][self.i] & lt["hydrophobic"][self.j]
        self.hb = ((lt["donor"][self.i] & lt["acceptor"][self.j])
                   | (lt["acceptor"][self.i] & lt["donor"][self.j]))

    def energy(self, poses: np.ndarray) -> np.ndarray:
        """poses [..., N, 3] -> [...] weighted intra energy."""
        if len(self.i) == 0:
            return np.zeros(poses.shape[:-2])
        diff = poses[..., self.i, :] - poses[..., self.j, :]
        r = np.sqrt(np.sum(diff * diff, -1))
        within = r < CUTOFF
        d = r - self.rad_sum
        e = (W_GAUSS1 * term_gauss1(d) + W_GAUSS2 * term_gauss2(d)
             + W_REPULSION * term_repulsion(d)
             + W_HYDROPHOBIC * term_hydrophobic(d) * self.hyd
             + W_HBOND * term_hbond(d) * self.hb)
        return np.sum(e * within, axis=-1)


# ---------------------------------------------------------------------------
# receptor grid maps
# ---------------------------------------------------------------------------

class VinaGrid:
    """Per-pocket receptor field on a regular grid, one channel per
    distinct ligand atom type tuple (radius, hydrophobic, donor,
    acceptor) — the binary's map files. Out-of-box positions pay a
    quadratic penalty that keeps the search inside (the binary clamps
    the search space to the box outright)."""

    OOB_PENALTY = 8.0       # kcal/mol per Å² outside the box

    def __init__(self, rec_pos: np.ndarray, rec_typing: Dict[str, np.ndarray],
                 center: np.ndarray, half_extent: np.ndarray,
                 spacing: float = 0.4):
        self.center = np.asarray(center, float)
        self.half = np.asarray(half_extent, float)
        self.spacing = float(spacing)
        self.lo = self.center - self.half
        self.dims = np.maximum(
            np.ceil(2 * self.half / spacing).astype(int) + 1, 2)
        rm = rec_typing["heavy"]
        rp = np.asarray(rec_pos, float)[rm]
        # receptor subset: atoms within reach of any box point
        near = np.all(np.abs(rp - self.center) < self.half + CUTOFF + 1.0,
                      axis=-1)
        self.rp = rp[near]
        self.r_rad = rec_typing["radius"][rm][near]
        self.r_hyd = rec_typing["hydrophobic"][rm][near]
        self.r_don = rec_typing["donor"][rm][near]
        self.r_acc = rec_typing["acceptor"][rm][near]
        self.channels: Dict[Tuple, np.ndarray] = {}
        ax = [self.lo[k] + np.arange(self.dims[k]) * spacing
              for k in range(3)]
        self._gx, self._gy, self._gz = ax

    # radial lookup resolution: 0.002 Å (the trilinear grid itself is 0.4
    # Å, so table quantization is far below the interpolation error)
    _R_STEP = 0.002

    def _radial_table(self, rad_sum: float, hyd: bool, hb: bool
                      ) -> np.ndarray:
        """Combined weighted energy e(r) for one pair class, tabulated
        over r in [0, CUTOFF). The exp/slope term math runs once per
        distinct (rad_sum, hyd, hb) class instead of once per grid×atom
        pair — the difference between ~45 s and ~4 s per channel build."""
        r = np.arange(0.0, CUTOFF, self._R_STEP)
        d = r - rad_sum
        e = (W_GAUSS1 * term_gauss1(d) + W_GAUSS2 * term_gauss2(d)
             + W_REPULSION * term_repulsion(d))
        if hyd:
            e = e + W_HYDROPHOBIC * term_hydrophobic(d)
        if hb:
            e = e + W_HBOND * term_hbond(d)
        out = np.zeros(len(r) + 1, np.float32)   # last slot: r >= CUTOFF
        out[:len(r)] = e
        return out

    def _build_channel(self, key: Tuple[float, bool, bool, bool]
                       ) -> np.ndarray:
        radius, hyd, don, acc = key
        nx, ny, nz = self.dims
        grid = np.zeros((nx, ny, nz), np.float32)
        if len(self.rp) == 0:
            self.channels[key] = grid
            return grid
        hyd_pair = self.r_hyd & bool(hyd)
        hb_pair = ((self.r_acc & bool(don)) | (self.r_don & bool(acc)))
        rad_sum = self.r_rad + radius
        # group receptor atoms by identical radial profile
        combos = {}
        for ri in range(len(self.rp)):
            ck = (round(float(rad_sum[ri]), 3), bool(hyd_pair[ri]),
                  bool(hb_pair[ri]))
            combos.setdefault(ck, []).append(ri)
        yz = np.stack(np.meshgrid(self._gy, self._gz, indexing="ij"),
                      -1).reshape(-1, 2)                     # [ny*nz, 2]
        n_slot = int(CUTOFF / self._R_STEP) + 1
        yz32 = yz.astype(np.float32)
        for ck, atom_ids in combos.items():
            table = self._radial_table(*ck)
            rp = self.rp[atom_ids].astype(np.float32)
            for ix in range(nx):                             # chunk by x
                # only receptor atoms within CUTOFF of this x-slice
                gx = np.float32(self._gx[ix])
                sl = np.abs(rp[:, 0] - gx) < CUTOFF
                if not sl.any():
                    continue
                rps = rp[sl]
                diff_yz = yz32[:, None, :] - rps[None, :, 1:]
                dx = gx - rps[:, 0]
                r2 = (np.sum(diff_yz * diff_yz, -1)
                      + (dx * dx)[None, :])                  # [P, R]
                r = np.sqrt(r2)
                idx = np.minimum((r * (1.0 / self._R_STEP)).astype(np.int32),
                                 n_slot - 1)
                grid[ix] += table[idx].sum(-1).reshape(ny, nz)
        self.channels[key] = grid
        return grid

    def channel_ids(self, lig_t: Dict[str, np.ndarray]
                    ) -> List[Tuple[float, bool, bool, bool]]:
        keys = []
        for i in range(len(lig_t["radius"])):
            keys.append((float(lig_t["radius"][i]),
                         bool(lig_t["hydrophobic"][i]),
                         bool(lig_t["donor"][i]),
                         bool(lig_t["acceptor"][i])))
        return keys

    def energy(self, poses: np.ndarray,
               keys: List[Tuple[float, bool, bool, bool]],
               heavy: np.ndarray) -> np.ndarray:
        """poses [..., N, 3] -> [...] interpolated inter energy + OOB
        penalty. Only heavy atoms contribute."""
        shape = poses.shape[:-2]
        flat = poses.reshape(-1, poses.shape[-2], 3)
        out = np.zeros(len(flat))
        # group atoms by channel for vectorized interpolation
        by_key: Dict[Tuple, List[int]] = {}
        for idx, k in enumerate(keys):
            if heavy[idx]:
                by_key.setdefault(k, []).append(idx)
        for k, atom_ids in by_key.items():
            g = self.channels.get(k)
            if g is None:
                g = self._build_channel(k)
            p = flat[:, atom_ids, :]                        # [P, A, 3]
            f = (p - self.lo) / self.spacing
            oob_lo = np.minimum(f, 0.0)
            oob_hi = np.maximum(f - (self.dims - 1), 0.0)
            oob = oob_lo + oob_hi                           # [P, A, 3]
            out += self.OOB_PENALTY * np.sum(
                np.square(oob * self.spacing), axis=(1, 2))
            f = np.clip(f, 0.0, self.dims - 1.000001)
            i0 = f.astype(int)
            i1 = np.minimum(i0 + 1, self.dims - 1)
            w = f - i0
            # trilinear
            val = np.zeros(p.shape[:2])
            for dx in (0, 1):
                wx = np.where(dx, w[..., 0], 1 - w[..., 0])
                xi = np.where(dx, i1[..., 0], i0[..., 0])
                for dy in (0, 1):
                    wy = np.where(dy, w[..., 1], 1 - w[..., 1])
                    yi = np.where(dy, i1[..., 1], i0[..., 1])
                    for dz in (0, 1):
                        wz = np.where(dz, w[..., 2], 1 - w[..., 2])
                        zi = np.where(dz, i1[..., 2], i0[..., 2])
                        val += wx * wy * wz * g[xi, yi, zi]
            out += val.sum(-1)
        return out.reshape(shape)


# ---------------------------------------------------------------------------
# the docking search
# ---------------------------------------------------------------------------

def _rand_rotation(rng: np.random.Generator) -> np.ndarray:
    """Uniform random rotation as an axis-angle vector."""
    v = rng.normal(size=3)
    v /= max(float(np.linalg.norm(v)), 1e-12)
    return v * rng.uniform(0, np.pi)


class _DockProblem:
    def __init__(self, mol: Molecule, grid: VinaGrid,
                 tree, intra: IntraTerm):
        self.pos0 = np.asarray(mol.pos, float)
        self.center0 = self.pos0.mean(0)
        self.grid = grid
        self.tree = tree
        self.intra = intra
        lt = ligand_typing(mol)
        self.keys = grid.channel_ids(lt)
        self.heavy = lt["heavy"]
        self.n_tor = len(tree)

    def pose(self, x: np.ndarray) -> np.ndarray:
        """x = [t(3) | w(3) | torsions(T)] -> positions."""
        return self.pose_many(np.asarray(x, float)[None])[0]

    def pose_many(self, xs: np.ndarray) -> np.ndarray:
        """Batched kinematics: xs [P, 6+T] -> [P, N, 3]. One vectorized
        Rodrigues per tree bond instead of a python pose() per probe —
        the difference between ~60 s and ~2 s per docked molecule."""
        P = xs.shape[0]
        pos = np.broadcast_to(self.pos0, (P,) + self.pos0.shape).copy()
        for bi, (a, b, moved) in enumerate(self.tree):
            ang = xs[:, 6 + bi]
            if not np.any(np.abs(ang) > 1e-12):
                continue
            axis = pos[:, b] - pos[:, a]
            pos[:, moved] = _rodrigues_batch(pos[:, moved], pos[:, b],
                                             axis, ang)
        w = xs[:, 3:6]
        theta = np.linalg.norm(w, axis=-1)
        rot = theta > 1e-12
        if np.any(rot):
            pos[rot] = _rodrigues_batch(
                pos[rot], np.broadcast_to(self.center0, (int(rot.sum()), 3)),
                w[rot], theta[rot])
        return pos + xs[:, None, :3]

    def energy_many(self, xs: np.ndarray) -> np.ndarray:
        poses = self.pose_many(np.asarray(xs, float))
        return (self.grid.energy(poses, self.keys, self.heavy)
                + self.intra.energy(poses))

    def energy(self, x: np.ndarray) -> float:
        return float(self.energy_many(x[None])[0])

    def minimize(self, x: np.ndarray, steps: int = 30,
                 lr: float = 0.05) -> Tuple[np.ndarray, float]:
        """Normalized-gradient descent with adaptive step (the shape of
        vina_native.minimize_rigid, extended to 6+T DOF); probes are
        batched through energy_many."""
        x = np.array(x, float)
        e = self.energy(x)
        dim = 6 + self.n_tor
        h = np.full(dim, 1e-3)
        for _ in range(steps):
            probes = np.repeat(x[None], 2 * dim, 0)
            probes[np.arange(dim) * 2, np.arange(dim)] += h
            probes[np.arange(dim) * 2 + 1, np.arange(dim)] -= h
            ev = self.energy_many(probes)
            g = (ev[0::2] - ev[1::2]) / (2 * h)
            nrm = float(np.linalg.norm(g))
            if nrm < 1e-7:
                break
            cand = x - lr * g / nrm
            e_cand = self.energy(cand)
            if e_cand < e:
                x, e = cand, e_cand
                lr = min(lr * 1.3, 0.4)
            else:
                lr *= 0.5
                if lr < 1e-4:
                    break
        return x, e


def dock(mol: Molecule, rec_pos: np.ndarray,
         rec_typing: Dict[str, np.ndarray], exhaustiveness: int = 8,
         mc_steps: int = 20, seed: int = 0, box_pad: float = 5.0,
         grid: Optional[VinaGrid] = None,
         spacing: float = 0.4) -> Dict[str, object]:
    """Monte-Carlo dock of ``mol`` into the receptor, seeded at the
    input pose plus ``exhaustiveness - 1`` random placements in the
    search box (input-pose bounding box + ``box_pad`` Å each side —
    generated/crystal poses define the site, matching the reference's
    pose-centered protocol). Returns the exact score-only breakdown of
    the best pose (term math shared with vina_native), the final
    positions, and the RMSD moved from the input pose.

    Pass a prebuilt ``grid`` (VinaGrid over the same box) to amortize
    map construction across the many molecules of one pocket."""
    rng = np.random.default_rng(seed)
    pos0 = np.asarray(mol.pos, float)
    center = 0.5 * (pos0.max(0) + pos0.min(0))
    half = (pos0.max(0) - pos0.min(0)) / 2 + box_pad
    if grid is None:
        grid = VinaGrid(rec_pos, rec_typing, center, half, spacing=spacing)
    tree = build_torsion_tree(mol)
    intra = IntraTerm(mol)
    prob = _DockProblem(mol, grid, tree, intra)
    T = prob.n_tor
    dim = 6 + T

    best_x, best_e = None, np.inf
    for run in range(max(exhaustiveness, 1)):
        if run == 0:
            x = np.zeros(dim)                       # the input pose
        else:
            x = np.zeros(dim)
            x[:3] = (rng.uniform(-1, 1, 3) * (grid.half - 1.0)
                     + grid.center - prob.center0)
            x[3:6] = _rand_rotation(rng)
            x[6:] = rng.uniform(-np.pi, np.pi, T)
        x, e = prob.minimize(x, steps=25)
        for _ in range(mc_steps):
            cand = np.array(x)
            cand[:3] += rng.normal(0, 1.0, 3)
            cand[3:6] += rng.normal(0, 0.25, 3)
            if T:
                cand[6:] += rng.normal(0, 0.5, T)
            cand, e_cand = prob.minimize(cand, steps=12)
            # Metropolis at the binary's T = 1.2 kcal/mol
            if e_cand < e or rng.uniform() < np.exp(-(e_cand - e) / 1.2):
                x, e = cand, e_cand
            if e < best_e:
                best_x, best_e = np.array(x), e
        if e < best_e:
            best_x, best_e = np.array(x), e

    best_x, _ = prob.minimize(best_x, steps=60)
    final_pos = prob.pose(best_x)

    # exact rescoring — no grid interpolation in the reported number
    lt = ligand_typing(mol)
    terms = pairwise_terms(final_pos, lt, np.asarray(rec_pos, float),
                           rec_typing)
    inter = (W_GAUSS1 * terms["gauss1"] + W_GAUSS2 * terms["gauss2"]
             + W_REPULSION * terms["repulsion"]
             + W_HYDROPHOBIC * terms["hydrophobic"]
             + W_HBOND * terms["hbond"])
    n_rot = count_rotatable_bonds(mol)
    out = dict(terms)
    out.update({
        "inter": float(inter), "n_rot": float(n_rot),
        "affinity": float(inter / (1.0 + W_ROT * n_rot)),
        "pos": final_pos,
        "rmsd_from_input": float(np.sqrt(
            np.mean(np.sum((final_pos - pos0) ** 2, -1)))),
        "n_torsions": int(T),
    })
    return out


def make_pocket_grid(rec_pos: np.ndarray, rec_typing: Dict[str, np.ndarray],
                     lig_positions: List[np.ndarray], box_pad: float = 5.0,
                     spacing: float = 0.4) -> VinaGrid:
    """One grid covering every pose of a pocket's molecule set (their
    joint bounding box + padding) — build once, dock many."""
    allp = np.concatenate([np.asarray(p, float) for p in lig_positions], 0)
    center = 0.5 * (allp.max(0) + allp.min(0))
    half = (allp.max(0) - allp.min(0)) / 2 + box_pad
    return VinaGrid(rec_pos, rec_typing, center, half, spacing=spacing)
