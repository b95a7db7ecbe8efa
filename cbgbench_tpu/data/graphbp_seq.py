"""GraphBP sequencer (host-side numpy).

Rewrite of the reference's Prim's-MST atom ordering + per-step internal
coordinate supervision (reference: repo/datasets/transforms/permutate.py:
8-254, sequential_sampler.py:8-86). Each training row is ONE generation
step of one molecule: the partial structure (protein ∪ ligand-context ∪
first i generated atoms) plus (focus, c1, c2, d, angle, torsion, new type)
targets and the focus/contact classifier labels.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..constants.molecule import MAX_VALENCE


def prim_order(dist: np.ndarray):
    """Prim's MST ordering from node 0. Returns (order, parent_of_ordered)
    where parent is in ORIGINAL index space (reference: permutate.py:26-33)."""
    n = len(dist)
    in_tree = np.zeros(n, bool)
    in_tree[0] = True
    order = [0]
    parents = []
    best = dist[0].copy()
    best_parent = np.zeros(n, int)
    for _ in range(n - 1):
        cand = np.where(~in_tree, best, np.inf)
        j = int(np.argmin(cand))
        order.append(j)
        parents.append(int(best_parent[j]))
        in_tree[j] = True
        upd = dist[j] < best
        best = np.where(upd, dist[j], best)
        best_parent = np.where(upd, j, best_parent)
    return np.array(order, int), np.array(parents, int)


def internal_coords(new_pos, f_pos, c1_pos, c2_pos):
    """(d, angle, torsion) of new_pos w.r.t. frame (focus, c1, c2)
    (reference: permutate.py:121-137)."""
    d = float(np.linalg.norm(new_pos - f_pos))
    a = float(np.dot(c1_pos - f_pos, new_pos - f_pos))
    b = float(np.linalg.norm(np.cross(c1_pos - f_pos, new_pos - f_pos)))
    angle = float(np.arctan2(b, a))
    plane1 = np.cross(f_pos - c1_pos, new_pos - c1_pos)
    plane2 = np.cross(f_pos - c1_pos, c2_pos - c1_pos)
    aa = float(np.dot(plane1, plane2))
    bb = float(np.dot(np.cross(plane1, plane2), f_pos - c1_pos)
               / (np.linalg.norm(f_pos - c1_pos) + 1e-12))
    torsion = float(np.arctan2(bb, aa))
    return d, angle, torsion


@struct.dataclass
class GraphBPBatch:
    z: jnp.ndarray            # [B, N] merged type vocab (lig | offset+rec)
    pos: jnp.ndarray          # [B, N, 3]
    mask: jnp.ndarray         # [B, N]
    gen_flag: jnp.ndarray     # [B, N]   placed generated atoms
    cannot_focus: jnp.ndarray  # [B, N]  label per placed gen atom
    focus: jnp.ndarray        # [B]     node index of focus
    c1: jnp.ndarray           # [B]
    c2: jnp.ndarray           # [B]
    new_type: jnp.ndarray     # [B]
    new_dist: jnp.ndarray     # [B]
    new_angle: jnp.ndarray    # [B]
    new_torsion: jnp.ndarray  # [B]
    is_first_step: jnp.ndarray  # [B]
    cannot_contact: jnp.ndarray  # [B, N] label per context atom (>4 A away)
    translation: jnp.ndarray  # [B, 3]

    @property
    def batch_size(self):
        return self.z.shape[0]


def build_graphbp_sample(sample: dict, rng: np.random.Generator,
                         num_atom_types: int = 13,
                         step: Optional[int] = None,
                         pos_noise: float = 0.1) -> dict:
    """Featurized (ligand, protein) -> one random-step GraphBP row (numpy).

    pos_noise jitters the PLACED prefix (exposure-bias mitigation: at
    sampling, prefixes are flow-placed, not crystal geometry — measured on
    the q3 checkpoints, the focus head reads clean-trained features of
    flow-placed prefixes as 'complete' after ~8 atoms and growth dies
    under the reference's min_atoms discard). Internal-coordinate targets
    are computed AGAINST the jittered anchors, so the flow learns to
    place the true atom from imperfect prefixes."""
    lig, rec = sample["ligand"], sample["protein"]
    pos_gen = lig["pos"]
    types_gen = lig["atype"]
    rec_pos = rec["pos"]
    rec_z = rec["element"] + num_atom_types      # offset protein vocab

    # valency from bonds (over the full ligand, before any ctx split)
    n_full = len(types_gen)
    con = np.zeros((n_full, n_full), int)
    bi, bt = lig.get("bond_index"), lig.get("bond_type")
    if bi is not None and bi.size:
        con[bi[0], bi[1]] = bt
        con[bi[1], bi[0]] = bt
    valency = con.sum(1)

    # decomp tasks: context ligand atoms condition like the protein but
    # keep their ligand-vocab ids; only the gen part is sequenced
    ctx_flag = lig.get("ctx_flag")
    if ctx_flag is not None and np.asarray(ctx_flag).any():
        ctx_flag = np.asarray(ctx_flag, bool)
        gen_sel = ~ctx_flag
        if not gen_sel.any():
            return None           # nothing to supervise on this sample
        rec_pos = np.concatenate([rec_pos, pos_gen[ctx_flag]])
        rec_z = np.concatenate([rec_z, types_gen[ctx_flag]])
        pos_gen = pos_gen[gen_sel]
        types_gen = types_gen[gen_sel]
        valency = valency[gen_sel]
        con = con[gen_sel][:, gen_sel]
    n_gen = len(types_gen)

    n = n_gen

    # contact ids + dense cannot-contact labels.  The reference supervises
    # the contact head with exactly TWO atoms per molecule — the closest
    # context atom (label 0) and the farthest (label 1)
    # (reference: repo/models/autoregression/graphbp.py loss; labels built
    # in permutate.py). On this corpus that signal collapses into an
    # uninformative head (measured: median score 0.000, 82% of atoms
    # "eligible"), so we densify: EVERY context atom gets a label,
    # cannot_contact = min-distance to the crystal ligand > 4 A (the same
    # 4 A convention as FLAG's rec_contact, flag_data.py:134).
    d_gc = np.linalg.norm(pos_gen[:, None] - rec_pos[None], axis=-1)
    cannot_contact_ctx = (d_gc.min(0) > 4.0).astype(np.float32)
    # first-step focus: a RANDOM contact-eligible receptor atom, exactly
    # the pool pick_focus_sample draws from at inference (the reference
    # trains on the single nearest atom but samples multinomial over
    # can_contact, graphbp.py:281-291 — an off-distribution conditioning
    # gap a large corpus hides; measured here: flows conditioned on
    # non-nearest contact atoms emitted d~1.5 A first placements that
    # froze growth). The first gen atom is the one nearest the chosen
    # focus, so d stays in the learnable 3-4 A contact band.
    eligible = np.where(cannot_contact_ctx == 0)[0]
    if len(eligible):
        ctx_contact = int(rng.choice(eligible))
    else:
        ctx_contact = int(np.unravel_index(np.argmin(d_gc), d_gc.shape)[1])
    gen_contact = int(np.argmin(d_gc[:, ctx_contact]))

    # reorder: contact gen atom first, then Prim over gen-gen distances
    perm0 = np.arange(n)
    perm0[0], perm0[gen_contact] = gen_contact, 0
    d_gg = np.linalg.norm(pos_gen[:, None] - pos_gen[None], axis=-1)
    d_gg = d_gg[perm0][:, perm0]
    order, parents = prim_order(d_gg)
    full_order = perm0[order]
    pos_o = pos_gen[full_order]
    types_o = types_gen[full_order]
    val_o = valency[full_order]
    con_o = con[full_order][:, full_order]

    i = int(rng.integers(0, n)) if step is None else step   # step index

    # nodes: rec ∪ placed gen[0:i] (prefix jittered — see docstring).
    # Curriculum: tiny prefixes get 3x the jitter — sampling-time drift is
    # worst right after the first flow placements (measured: growth stops
    # at 1-2 atoms on pockets where the first placement lands slightly
    # off-manifold), so the heads/flows must be robust exactly there.
    prefix = pos_o[:i]
    if pos_noise > 0 and i > 0:
        sigma = pos_noise * (3.0 if i <= 3 else 1.0)
        prefix = prefix + rng.normal(0.0, sigma, prefix.shape)
    nodes_pos = np.concatenate([rec_pos, prefix])
    nodes_z = np.concatenate([rec_z, types_o[:i]])
    gen_flag = np.concatenate([np.zeros(len(rec_pos), bool), np.ones(i, bool)])

    # focus/c1/c2 + internal coords for placing atom i
    if i == 0:
        f = ctx_contact
        d_to_f = np.linalg.norm(rec_pos - rec_pos[f], axis=-1)
        near = np.argsort(d_to_f)
        c1_, c2_ = int(near[1]), int(near[2])
    else:
        # parent (focus) of ordered atom i in the placed prefix
        parent_ordered = int(np.where(order == parents[i - 1])[0][0]) \
            if i - 1 < len(parents) else 0
        f = len(rec_pos) + parent_ordered
        d_to_f = np.linalg.norm(nodes_pos - nodes_pos[f], axis=-1)
        d_to_f[f] = np.inf
        near = np.argsort(d_to_f)
        c1_, c2_ = int(near[0]), int(near[1])
    d, angle, torsion = internal_coords(pos_o[i], nodes_pos[f],
                                        nodes_pos[c1_], nodes_pos[c2_])

    # cannot-focus labels for placed gen atoms: all bonds used up
    bond_used = con_o[:i, :i].sum(1)
    cannot_focus = np.zeros(len(nodes_pos), np.float32)
    cannot_focus[len(rec_pos):] = (bond_used >= val_o[:i]).astype(np.float32)

    return {
        "z": nodes_z, "pos": nodes_pos, "gen_flag": gen_flag,
        "cannot_focus": cannot_focus, "focus": f, "c1": c1_, "c2": c2_,
        "new_type": int(types_o[i]), "new_dist": d, "new_angle": angle,
        "new_torsion": torsion, "is_first_step": i == 0,
        "cannot_contact": np.concatenate(
            [cannot_contact_ctx, np.zeros(i, np.float32)]),
        "translation": sample.get("translation", np.zeros(3, np.float32)),
    }


def build_graphbp_rollout_sample(sample: dict, roll_pos: np.ndarray,
                                 roll_types: np.ndarray,
                                 rng: np.random.Generator,
                                 num_atom_types: int = 13,
                                 mode: str = "basic") -> Optional[dict]:
    """Scheduled-sampling training row (VERDICT r4 #4): the placed prefix
    is a MODEL ROLLOUT (positions/types the sampler actually produced from
    this pocket), and the targets continue toward the crystal ligand.

    The r4 prefix experiment (results/q4_graphbp_prefix: 3%→36% validity
    for k=0→5 crystal prefix atoms) proved the machinery completes from
    on-manifold states; this supervises exactly the off-manifold states
    the sampler visits instead of approximating them with Gaussian jitter
    (the r3 curriculum noise). Target construction (DAgger-flavored):

      * greedily match each rollout atom to its nearest unclaimed crystal
        gen atom; the unmatched crystal atoms are still-to-place,
      * the next target is the unmatched crystal atom nearest the rollout
        prefix (Prim-style continuation),
      * focus = the rollout atom nearest that target; c1/c2 = the two
        nodes nearest the focus (the sampler's own anchor geometry,
        models/graphbp.py pick_focus_sample),
      * (d, angle, torsion) computed against the ROLLOUT anchors, so the
        flows learn to place true atoms from drifted prefixes,
      * cannot_focus for prefix atoms by perceived valence saturation
        (neighbors within 1.75 Å vs MAX_VALENCE of the type's element):
        atoms with spare valence read CAN-focus while crystal atoms
        remain — the anti-early-termination signal.

    No crystal-ligand atom enters the CONDITIONING (prefix + receptor);
    crystal atoms appear only as supervision targets, exactly like
    ordinary teacher forcing."""
    from ..constants.molecule import get_atomic_number_from_index

    lig, rec = sample["ligand"], sample["protein"]
    pos_gen = np.asarray(lig["pos"], np.float32)
    types_gen = np.asarray(lig["atype"], np.int32)
    rec_pos = np.asarray(rec["pos"], np.float32)
    rec_z = np.asarray(rec["element"], np.int32) + num_atom_types
    ctx_flag = lig.get("ctx_flag")
    if ctx_flag is not None and np.asarray(ctx_flag).any():
        return None           # denovo-only (decomp tasks keep teacher data)

    roll_pos = np.asarray(roll_pos, np.float32)
    roll_types = np.asarray(roll_types, np.int32)
    i = len(roll_pos)
    if i == 0 or len(pos_gen) <= i:
        return None

    # greedy one-to-one matching rollout -> crystal (by ascending pair
    # distance); unmatched crystal atoms remain to be placed
    d_rc = np.linalg.norm(roll_pos[:, None] - pos_gen[None], axis=-1)
    claimed = np.zeros(len(pos_gen), bool)
    order = np.dstack(np.unravel_index(np.argsort(d_rc, axis=None),
                                       d_rc.shape))[0]
    used_roll = np.zeros(i, bool)
    for r, c in order:
        if used_roll[r] or claimed[c]:
            continue
        used_roll[r] = True
        claimed[c] = True
        if used_roll.all():
            break
    remaining = np.where(~claimed)[0]
    if len(remaining) == 0:
        return None

    # next target: unmatched crystal atom nearest the prefix
    d_min = d_rc[:, remaining].min(0)
    target = int(remaining[int(np.argmin(d_min))])

    nodes_pos = np.concatenate([rec_pos, roll_pos])
    nodes_z = np.concatenate([rec_z, roll_types])
    n_rec = len(rec_pos)
    gen_flag = np.concatenate([np.zeros(n_rec, bool), np.ones(i, bool)])

    f = n_rec + int(np.argmin(d_rc[:, target]))
    d_to_f = np.linalg.norm(nodes_pos - nodes_pos[f], axis=-1)
    d_to_f[f] = np.inf
    near = np.argsort(d_to_f)
    c1_, c2_ = int(near[0]), int(near[1])
    d, angle, torsion = internal_coords(pos_gen[target], nodes_pos[f],
                                        nodes_pos[c1_], nodes_pos[c2_])
    if not (np.isfinite(d) and np.isfinite(angle) and np.isfinite(torsion)):
        return None

    # perceived valence saturation of the rollout prefix
    cannot_focus = np.zeros(len(nodes_pos), np.float32)
    if i > 1:
        d_rr = np.linalg.norm(roll_pos[:, None] - roll_pos[None], axis=-1)
        nb = ((d_rr < 1.75).sum(1) - 1)
    else:
        nb = np.zeros(1, int)
    for a in range(i):
        try:
            z_el = int(get_atomic_number_from_index(
                int(roll_types[a]), mode)[0])
        except Exception:
            z_el = 6
        cannot_focus[n_rec + a] = float(nb[a] >= MAX_VALENCE.get(z_el, 4))

    d_gc = np.linalg.norm(pos_gen[:, None] - rec_pos[None], axis=-1)
    cannot_contact_ctx = (d_gc.min(0) > 4.0).astype(np.float32)

    return {
        "z": nodes_z, "pos": nodes_pos, "gen_flag": gen_flag,
        "cannot_focus": cannot_focus, "focus": f, "c1": c1_, "c2": c2_,
        "new_type": int(types_gen[target]), "new_dist": d,
        "new_angle": angle, "new_torsion": torsion, "is_first_step": False,
        "cannot_contact": np.concatenate(
            [cannot_contact_ctx, np.zeros(i, np.float32)]),
        "translation": sample.get("translation", np.zeros(3, np.float32)),
    }


def stack_graphbp_batch(samples, cap: int = 512) -> GraphBPBatch:
    b = len(samples)
    out = dict(
        z=np.zeros((b, cap), np.int32), pos=np.zeros((b, cap, 3), np.float32),
        mask=np.zeros((b, cap), bool), gen_flag=np.zeros((b, cap), bool),
        cannot_focus=np.zeros((b, cap), np.float32),
        focus=np.zeros(b, np.int32), c1=np.zeros(b, np.int32),
        c2=np.zeros(b, np.int32), new_type=np.zeros(b, np.int32),
        new_dist=np.zeros(b, np.float32), new_angle=np.zeros(b, np.float32),
        new_torsion=np.zeros(b, np.float32),
        is_first_step=np.zeros(b, bool),
        cannot_contact=np.zeros((b, cap), np.float32),
        translation=np.zeros((b, 3), np.float32),
    )
    for i, s in enumerate(samples):
        nn_ = len(s["z"])
        if nn_ > cap:
            raise ValueError(f"graph with {nn_} nodes exceeds cap {cap}")
        out["z"][i, :nn_] = s["z"]
        out["pos"][i, :nn_] = s["pos"]
        out["mask"][i, :nn_] = True
        out["gen_flag"][i, :nn_] = s["gen_flag"]
        out["cannot_focus"][i, :nn_] = s["cannot_focus"]
        out["cannot_contact"][i, :nn_] = s["cannot_contact"]
        for k in ("focus", "c1", "c2", "new_type", "new_dist", "new_angle",
                  "new_torsion", "is_first_step", "translation"):
            out[k][i] = s[k]
    return GraphBPBatch(**{k: jnp.asarray(v) for k, v in out.items()})
