"""Pocket2Mol training-sample builder + padded batch structures.

Host-side (numpy) rebuild of the reference transform chain for Pocket2Mol:
mixed_mask -> count_bond_neighbors -> build_focal_for_ligand ->
sample_edge_for_ligand -> contrastive_sample -> hetero_merge
(reference: configs/denovo/common/ar_data_train.yml + transforms in
repo/datasets/transforms/{mask,focal_builder,edge_constructor,
contrastive_sampler}.py).

The PyG HeteroData with flat index lists becomes fixed-shape padded slots:
  ctx atoms   [B, NL]        masked atoms  [B, NM]
  contrast    [B, NC]        per-target edges to ctx  [B, NC, EK]
Edge-pair attention (the reference's att_edge_index over an "edge graph")
is simply the dense [NC, EK, EK] pairing inside each target's slot block.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from .mask import (count_bond_neighbors, mixed_mask, subgraph_bonds)


@struct.dataclass
class P2MBatch:
    # protein (same as ProteinNodes, kept flat here)
    rec_pos: jnp.ndarray          # [B, NR, 3]
    rec_element: jnp.ndarray      # [B, NR]
    rec_is_backbone: jnp.ndarray  # [B, NR]
    rec_aa: jnp.ndarray           # [B, NR]
    rec_mask: jnp.ndarray         # [B, NR]
    rec_focal_flag: jnp.ndarray   # [B, NR]
    rec_pred_flag: jnp.ndarray    # [B, NR]
    # ligand context
    ctx_pos: jnp.ndarray          # [B, NL, 3]
    ctx_atype: jnp.ndarray        # [B, NL]
    ctx_mask: jnp.ndarray         # [B, NL]
    ctx_bond: jnp.ndarray         # [B, NL, NL] int8 (0 = none)
    ctx_focal_flag: jnp.ndarray   # [B, NL]
    ctx_pred_flag: jnp.ndarray    # [B, NL]
    ctx_frontier: jnp.ndarray     # [B, NL] (has missing neighbors)
    # masked (ground-truth future atoms)
    msk_pos: jnp.ndarray          # [B, NM, 3]
    msk_mask: jnp.ndarray         # [B, NM]
    msk_gen_flag: jnp.ndarray     # [B, NM] (bridge endpoints)
    # MDN supervision: focal -> masked target pairs
    lig_focal_edge: jnp.ndarray   # [B, EF, 2] (ctx_idx, msk_idx)
    lig_focal_edge_mask: jnp.ndarray  # [B, EF]
    rec_focal_edge: jnp.ndarray   # [B, EF, 2] (rec_idx, msk_idx)
    rec_focal_edge_mask: jnp.ndarray  # [B, EF]
    # contrastive targets
    con_pos_real: jnp.ndarray     # [B, NC, 3]
    con_type_real: jnp.ndarray    # [B, NC]
    con_pos_fake: jnp.ndarray     # [B, NC, 3]
    con_mask: jnp.ndarray         # [B, NC]
    # per-target candidate edges to ctx atoms
    con_edge_ctx: jnp.ndarray     # [B, NC, EK] ctx index
    con_edge_type: jnp.ndarray    # [B, NC, EK] bond class (0 = no bond)
    con_edge_mask: jnp.ndarray    # [B, NC, EK]
    translation: jnp.ndarray      # [B, 3]

    @property
    def batch_size(self):
        return self.rec_pos.shape[0]


def build_p2m_sample(sample: dict, rng: np.random.Generator,
                     num_contrast: int = 16, edge_k: int = 8,
                     edge_cap: int = 12, focal_cutoff: float = 4.0,
                     pos_real_std: float = 0.05, pos_fake_std: float = 2.0,
                     min_ratio=0.0, max_ratio=1.2) -> dict:
    """One featurized (ligand, protein) sample -> P2M training arrays
    (unpadded numpy; pad via stack_p2m_batch)."""
    lig = sample["ligand"]
    rec = sample["protein"]
    n = len(lig["atype"])
    bi, bt = lig.get("bond_index"), lig.get("bond_type")
    ctx_flag = lig.get("ctx_flag")

    masked_idx, context_idx = mixed_mask(
        n, bi, rng, min_ratio=min_ratio, max_ratio=max_ratio,
        min_num_masked=1, min_num_unmasked=0, ctx_flag=ctx_flag)

    num_nb_full = count_bond_neighbors(n, bi)
    ctx_bi, ctx_bt = subgraph_bonds(bi, bt, context_idx)
    num_nb_ctx = count_bond_neighbors(len(context_idx), ctx_bi)
    frontier = num_nb_ctx < num_nb_full[context_idx]

    # ---- bridge bonds (masked <-> ctx) -> focal/gen flags ----
    pos_of = {int(v): k for k, v in enumerate(masked_idx)}
    ctx_of = {int(v): k for k, v in enumerate(context_idx)}
    bridge = []          # (msk_new, ctx_new, bond_type)
    if bi is not None and bi.size:
        for k in range(bi.shape[1]):
            a, b = int(bi[0, k]), int(bi[1, k])
            if a in pos_of and b in ctx_of:
                bridge.append((pos_of[a], ctx_of[b], int(bt[k])))

    n_ctx, n_msk = len(context_idx), len(masked_idx)
    ctx_focal = np.zeros(n_ctx, bool)
    msk_gen = np.zeros(n_msk, bool)
    for m, c, _t in bridge:
        ctx_focal[c] = True
        msk_gen[m] = True

    has_ctx = n_ctx > 0
    rec_pos = rec["pos"]
    msk_pos = lig["pos"][masked_idx]
    rec_focal = np.zeros(len(rec_pos), bool)
    if not has_ctx:
        d = np.linalg.norm(rec_pos[:, None] - msk_pos[None], axis=-1)
        rec_focal = (d.min(axis=1) < focal_cutoff) if n_msk else rec_focal
        msk_gen = (d.min(axis=0) < focal_cutoff) if n_msk else msk_gen
    ctx_pred = np.ones(n_ctx, bool) if has_ctx else np.zeros(n_ctx, bool)
    rec_pred = np.zeros(len(rec_pos), bool) if has_ctx else \
        np.ones(len(rec_pos), bool)

    # ---- MDN focal->target pairs ----
    if has_ctx:
        lig_fe = np.array([(c, m) for m, c, _ in bridge], int).reshape(-1, 2)
        rec_fe = np.zeros((0, 2), int)
    else:
        lig_fe = np.zeros((0, 2), int)
        pairs = np.argwhere(
            np.linalg.norm(rec_pos[:, None] - msk_pos[None], axis=-1)
            < focal_cutoff)
        rec_fe = pairs.reshape(-1, 2)

    # ---- per-masked-atom candidate edges to ctx (pos bonds + knn negs) ----
    edge_ctx = np.zeros((n_msk, edge_cap), int)
    edge_type = np.zeros((n_msk, edge_cap), int)
    edge_mask = np.zeros((n_msk, edge_cap), bool)
    if has_ctx and n_msk:
        ctx_pos = lig["pos"][context_idx]
        d = np.linalg.norm(msk_pos[:, None] - ctx_pos[None], axis=-1)
        bond_map = {}
        for m, c, t in bridge:
            bond_map.setdefault(m, []).append((c, t))
        for m in range(n_msk):
            slots = list(bond_map.get(m, []))
            order = np.argsort(d[m])
            for c in order:
                if len(slots) >= min(edge_cap, edge_k + len(bond_map.get(m, []))):
                    break
                if all(c != s[0] for s in slots):
                    slots.append((int(c), 0))
            for s_i, (c, t) in enumerate(slots[:edge_cap]):
                edge_ctx[m, s_i] = c
                edge_type[m, s_i] = t
                edge_mask[m, s_i] = True

    # ---- contrastive real/fake draws ----
    p = msk_gen.astype(float)
    if p.sum() == 0:
        p = np.ones(max(n_msk, 1))
    if n_msk:
        real_idx = rng.choice(n_msk, size=num_contrast, p=p / p.sum())
    else:
        real_idx = np.zeros(num_contrast, int)
    con_real = msk_pos[real_idx] + rng.normal(
        scale=pos_real_std, size=(num_contrast, 3)) if n_msk else \
        np.zeros((num_contrast, 3))
    con_type = lig["atype"][masked_idx][real_idx] if n_msk else \
        np.zeros(num_contrast, int)
    if has_ctx and frontier.any():
        fake_pool = lig["pos"][context_idx][frontier]
    elif rec_focal.any():
        fake_pool = rec_pos[rec_focal]
    else:
        fake_pool = rec_pos
    fk = rng.choice(len(fake_pool), size=num_contrast)
    con_fake = fake_pool[fk] + rng.normal(scale=pos_fake_std / 2.0,
                                          size=(num_contrast, 3))

    return {
        "protein": rec, "translation": sample.get("translation",
                                                  np.zeros(3, np.float32)),
        "rec_focal": rec_focal, "rec_pred": rec_pred,
        "ctx_pos": lig["pos"][context_idx],
        "ctx_atype": lig["atype"][context_idx],
        "ctx_bond_index": ctx_bi, "ctx_bond_type": ctx_bt,
        "ctx_focal": ctx_focal, "ctx_pred": ctx_pred, "frontier": frontier,
        "msk_pos": msk_pos, "msk_gen": msk_gen,
        "lig_focal_edge": lig_fe, "rec_focal_edge": rec_fe,
        "con_pos_real": con_real, "con_type_real": con_type,
        "con_pos_fake": con_fake,
        "con_edge_ctx": edge_ctx[real_idx] if n_msk else
        np.zeros((num_contrast, edge_cap), int),
        "con_edge_type": edge_type[real_idx] if n_msk else
        np.zeros((num_contrast, edge_cap), int),
        "con_edge_mask": edge_mask[real_idx] if n_msk else
        np.zeros((num_contrast, edge_cap), bool),
    }


def build_p2m_ctx_start(sample: dict, num_contrast: int = 4,
                        edge_cap: int = 8) -> dict:
    """Sampling start state for decomp tasks: the kept context fragment is
    the initial ligand context, frontier = ctx atoms that lost bonds into
    the removed gen part (reference: pocket2mol.py sample_init with ligand
    context present). Pass through stack_p2m_batch like training samples."""
    lig = sample["ligand"]
    rec = sample["protein"]
    ctx_flag = np.asarray(lig.get("ctx_flag",
                                  np.zeros(len(lig["atype"]), bool)), bool)
    ctx_idx = np.flatnonzero(ctx_flag)
    n = len(lig["atype"])
    bi, bt = lig.get("bond_index"), lig.get("bond_type")
    num_nb_full = count_bond_neighbors(n, bi)
    ctx_bi, ctx_bt = subgraph_bonds(bi, bt, ctx_idx)
    num_nb_ctx = count_bond_neighbors(len(ctx_idx), ctx_bi)
    frontier = num_nb_ctx < num_nb_full[ctx_idx]
    if len(ctx_idx) and not frontier.any():
        frontier[:] = True          # degenerate decomp: grow from anywhere
    has_ctx = len(ctx_idx) > 0
    nr = len(rec["pos"])
    return {
        "protein": rec,
        "translation": sample.get("translation", np.zeros(3, np.float32)),
        "rec_focal": np.zeros(nr, bool),
        "rec_pred": np.zeros(nr, bool) if has_ctx else np.ones(nr, bool),
        "ctx_pos": lig["pos"][ctx_idx], "ctx_atype": lig["atype"][ctx_idx],
        "ctx_bond_index": ctx_bi, "ctx_bond_type": ctx_bt,
        "ctx_focal": frontier.copy(),
        "ctx_pred": np.ones(len(ctx_idx), bool), "frontier": frontier,
        "msk_pos": np.zeros((0, 3)), "msk_gen": np.zeros(0, bool),
        "lig_focal_edge": np.zeros((0, 2), int),
        "rec_focal_edge": np.zeros((0, 2), int),
        "con_pos_real": np.zeros((num_contrast, 3)),
        "con_type_real": np.zeros(num_contrast, int),
        "con_pos_fake": np.zeros((num_contrast, 3)),
        "con_edge_ctx": np.zeros((num_contrast, edge_cap), int),
        "con_edge_type": np.zeros((num_contrast, edge_cap), int),
        "con_edge_mask": np.zeros((num_contrast, edge_cap), bool),
    }


def stack_p2m_batch(samples, lig_cap=64, rec_cap=448, msk_cap=64,
                    ef_cap=48, truncate=False) -> P2MBatch:
    """truncate=False (training): an oversized sample raises ValueError so
    the loader drops the batch — truncated supervision is corrupted
    supervision. truncate=True (sampling): clip to capacity instead; real
    CrossDocked ligands can exceed lig_cap (6HAX: 66 atoms at cap 64) and
    a sampler must still run, generating up to cap atoms."""
    from .batch import _pad_to

    b = len(samples)
    nc, ek = samples[0]["con_edge_ctx"].shape

    def zeros(shape, dtype=np.float32):
        return np.zeros((b,) + shape, dtype)

    out = dict(
        rec_pos=zeros((rec_cap, 3)), rec_element=zeros((rec_cap,), np.int32),
        rec_is_backbone=zeros((rec_cap,), bool), rec_aa=zeros((rec_cap,), np.int32),
        rec_mask=zeros((rec_cap,), bool), rec_focal_flag=zeros((rec_cap,), bool),
        rec_pred_flag=zeros((rec_cap,), bool),
        ctx_pos=zeros((lig_cap, 3)), ctx_atype=zeros((lig_cap,), np.int32),
        ctx_mask=zeros((lig_cap,), bool),
        ctx_bond=zeros((lig_cap, lig_cap), np.int8),
        ctx_focal_flag=zeros((lig_cap,), bool),
        ctx_pred_flag=zeros((lig_cap,), bool),
        ctx_frontier=zeros((lig_cap,), bool),
        msk_pos=zeros((msk_cap, 3)), msk_mask=zeros((msk_cap,), bool),
        msk_gen_flag=zeros((msk_cap,), bool),
        lig_focal_edge=zeros((ef_cap, 2), np.int32),
        lig_focal_edge_mask=zeros((ef_cap,), bool),
        rec_focal_edge=zeros((ef_cap, 2), np.int32),
        rec_focal_edge_mask=zeros((ef_cap,), bool),
        con_pos_real=zeros((nc, 3)), con_type_real=zeros((nc,), np.int32),
        con_pos_fake=zeros((nc, 3)), con_mask=np.ones((b, nc), bool),
        con_edge_ctx=zeros((nc, ek), np.int32),
        con_edge_type=zeros((nc, ek), np.int32),
        con_edge_mask=zeros((nc, ek), bool),
        translation=zeros((3,)),
    )
    for i, s in enumerate(samples):
        rec = s["protein"]
        if not truncate and (len(s["ctx_atype"]) > lig_cap
                             or len(s["msk_pos"]) > msk_cap
                             or len(rec["pos"]) > rec_cap):
            raise ValueError(
                f"sample exceeds shape bucket (ctx {len(s['ctx_atype'])}/"
                f"{lig_cap}, msk {len(s['msk_pos'])}/{msk_cap}, rec "
                f"{len(rec['pos'])}/{rec_cap}); pass truncate=True to clip")
        nr = min(len(rec["pos"]), rec_cap)
        out["rec_pos"][i, :nr] = rec["pos"][:nr]
        out["rec_element"][i, :nr] = rec["element"][:nr]
        out["rec_is_backbone"][i, :nr] = rec["is_backbone"][:nr]
        out["rec_aa"][i, :nr] = rec["aa"][:nr]
        out["rec_mask"][i, :nr] = True
        out["rec_focal_flag"][i, :nr] = s["rec_focal"][:nr]
        out["rec_pred_flag"][i, :nr] = s["rec_pred"][:nr]
        nl = min(len(s["ctx_atype"]), lig_cap)
        out["ctx_pos"][i, :nl] = s["ctx_pos"][:nl]
        out["ctx_atype"][i, :nl] = s["ctx_atype"][:nl]
        out["ctx_mask"][i, :nl] = True
        bi, bt = s["ctx_bond_index"], s["ctx_bond_type"]
        if bi.size:
            keep = (bi[0] < lig_cap) & (bi[1] < lig_cap)
            out["ctx_bond"][i, bi[0][keep], bi[1][keep]] = bt[keep]
        out["ctx_focal_flag"][i, :nl] = s["ctx_focal"][:nl]
        out["ctx_pred_flag"][i, :nl] = s["ctx_pred"][:nl]
        out["ctx_frontier"][i, :nl] = s["frontier"][:nl]
        nm = min(len(s["msk_pos"]), msk_cap)
        out["msk_pos"][i, :nm] = s["msk_pos"][:nm]
        out["msk_mask"][i, :nm] = True
        out["msk_gen_flag"][i, :nm] = s["msk_gen"][:nm]
        for key, src_cap in (("lig_focal_edge", nl), ("rec_focal_edge", nr)):
            fe = s[key]
            if fe.size:     # drop edges referencing truncated atoms
                fe = fe[(fe[:, 0] < src_cap) & (fe[:, 1] < nm)]
            fe = fe[:ef_cap]
            out[key][i, :len(fe)] = fe
            out[key + "_mask"][i, :len(fe)] = True
        out["con_pos_real"][i] = s["con_pos_real"]
        out["con_type_real"][i] = s["con_type_real"]
        out["con_pos_fake"][i] = s["con_pos_fake"]
        out["con_edge_ctx"][i] = np.minimum(s["con_edge_ctx"], lig_cap - 1)
        out["con_edge_type"][i] = s["con_edge_type"]
        out["con_edge_mask"][i] = (s["con_edge_mask"]
                                   & (s["con_edge_ctx"] < lig_cap))
        out["translation"][i] = s["translation"]
    return P2MBatch(**{k: jnp.asarray(v) for k, v in out.items()})
