"""Rigid-frame / rotation / dihedral geometry, pure jnp.

TPU-native rewrite of the reference geometry helpers
(reference: repo/models/utils/geometry.py). All functions are shape-
polymorphic over leading batch dims and jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x, axis=-1, keepdims=False, eps=1e-8, sqrt=True):
    out = jnp.maximum(jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims), eps)
    return jnp.sqrt(out) if sqrt else out


def normalize_vector(v, axis=-1, eps=1e-6):
    return v / (jnp.linalg.norm(v, axis=axis, keepdims=True) + eps)


def project_v2v(v, e, axis=-1):
    """Project vector v onto unit vector e."""
    return jnp.sum(e * v, axis=axis, keepdims=True) * e


def pairwise_distances(x, y=None, return_v=False):
    """x: [..., N, d], y: [..., M, d] -> [..., N, M]."""
    if y is None:
        y = x
    v = x[..., :, None, :] - y[..., None, :, :]
    d = safe_norm(v, axis=-1)
    return (d, v) if return_v else d


def construct_3d_basis(center, p1, p2):
    """Gram-Schmidt frame from three points -> [..., 3, 3] with column
    vectors [e1, e2, e3]; e1 toward p1, e2 in the (p1, p2) plane."""
    e1 = normalize_vector(p1 - center)
    v2 = p2 - center
    u2 = v2 - project_v2v(v2, e1)
    e2 = normalize_vector(u2)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3], axis=-1)


def construct_3d_basis_include_single_atom(center, p1, p2):
    """Frame that degrades to zeros when p1 == p2 == 0 (single-atom motifs).
    (reference: geometry.py construct_3d_basis_include_single_atom)"""
    degenerate = jnp.logical_and(
        jnp.all(p1 == p2, axis=-1),
        (jnp.abs(p1.sum(-1)) + jnp.abs(p2.sum(-1))) < 1e-6)
    R = construct_3d_basis(center, p1, p2)
    return R * (~degenerate)[..., None, None]


def local_to_global(R, t, p):
    """q = R p + t.  R: [..., 3, 3], t: [..., 3], p: [..., M, 3] or [..., 3]."""
    if p.shape == t.shape:
        return jnp.einsum("...ij,...j->...i", R, p) + t
    return jnp.einsum("...ij,...mj->...mi", R, p) + t[..., None, :]


def global_to_local(R, t, q):
    """p = R^T (q - t)."""
    if q.shape == t.shape:
        return jnp.einsum("...ji,...j->...i", R, q - t)
    return jnp.einsum("...ji,...mj->...mi", R, q - t[..., None, :])


# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------

def quaternion_to_rotation_matrix(q):
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rr = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return rr.reshape(q.shape[:-1] + (3, 3))


def quaternion_1ijk_to_rotation_matrix(v):
    """Un-normalized (1, b, c, d) quaternion update -> rotation matrix.
    Used by IPA-style frame updates (AlphaFold supplementary 1.8.3)."""
    ones = jnp.ones_like(v[..., :1])
    q = jnp.concatenate([ones, v], axis=-1)
    return quaternion_to_rotation_matrix(q)


def rotation_matrix_cosine_loss(R_pred, R_true):
    """Sum over the 3 column-vector cosine distances (reference:
    repo/models/diffusion/difffg.py:16-30)."""
    size = R_pred.shape[:-2]
    ncol = R_pred.reshape(size + (9,)).reshape(-1, 3, 3)
    tcol = R_true.reshape(size + (9,)).reshape(-1, 3, 3)
    # columns of R: R[..., :, i]
    cos = jnp.sum(ncol * tcol, axis=-2) / (
        jnp.linalg.norm(ncol, axis=-2) * jnp.linalg.norm(tcol, axis=-2) + 1e-8)
    loss = jnp.sum(1 - cos, axis=-1)
    return loss.reshape(size)


# ---------------------------------------------------------------------------
# Dihedrals
# ---------------------------------------------------------------------------

def dihedral_from_four_points(p0, p1, p2, p3):
    """Signed dihedral of (p0, p1, p2, p3) around the p1-p2 axis, [..., ]."""
    v0 = p2 - p1
    v1 = p0 - p1
    v2 = p3 - p2
    u1 = jnp.cross(v0, v1)
    n1 = u1 / (jnp.linalg.norm(u1, axis=-1, keepdims=True) + 1e-8)
    u2 = jnp.cross(v0, v2)
    n2 = u2 / (jnp.linalg.norm(u2, axis=-1, keepdims=True) + 1e-8)
    sgn = jnp.sign(jnp.sum(jnp.cross(v0, n1) * n2, axis=-1))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    cos = jnp.clip(jnp.sum(n1 * n2, axis=-1), -1 + 1e-7, 1 - 1e-7)
    return sgn * jnp.arccos(cos)


def angle_from_three_points(p0, p1, p2):
    """Bond angle at p1, in radians."""
    v1 = normalize_vector(p0 - p1)
    v2 = normalize_vector(p2 - p1)
    cos = jnp.clip(jnp.sum(v1 * v2, axis=-1), -1 + 1e-7, 1 - 1e-7)
    return jnp.arccos(cos)


def apply_rotation_about_axis(pos, axis_point, axis_dir, angle):
    """Rodrigues rotation of points about a line (for torsion updates)."""
    k = normalize_vector(axis_dir)
    p = pos - axis_point
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rot = (p * cos + jnp.cross(jnp.broadcast_to(k, p.shape), p) * sin
           + k * jnp.sum(k * p, axis=-1, keepdims=True) * (1 - cos))
    return rot + axis_point


def von_mises_loss(pred_angle, true_angle, kappa: float = 1.0):
    """Negative cosine-similarity von Mises loss on angles
    (reference: repo/utils/dihedutils.py von_Mises_loss)."""
    return 1.0 - jnp.cos(pred_angle - true_angle)


def batch_dihedrals(p0, p1, p2, p3):
    """Vectorized signed dihedrals [..., ] (reference: dihedutils.py
    batch_dihedrals); alias of dihedral_from_four_points."""
    return dihedral_from_four_points(p0, p1, p2, p3)
