"""SO(3) and geometry math tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cbgbench_tpu.utils import so3
from cbgbench_tpu.utils.geometry import (construct_3d_basis,
                                         dihedral_from_four_points,
                                         local_to_global, global_to_local,
                                         quaternion_to_rotation_matrix)


def _random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(quaternion_to_rotation_matrix(jnp.asarray(q)))


def test_rotation_so3vec_roundtrip():
    # Avoid angles near pi where the matrix log is inherently singular
    # (R - R^T -> 0); the reference shares this limitation.
    rng = np.random.default_rng(0)
    axis = rng.normal(size=(32, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(0.01, 2.8, size=(32, 1))
    w0 = jnp.asarray((axis * angle).astype(np.float32))
    R = np.asarray(so3.so3vec_to_rotation(w0))
    w = so3.rotation_to_so3vec(jnp.asarray(R))
    R2 = np.asarray(so3.so3vec_to_rotation(w))
    np.testing.assert_allclose(R2, R, atol=2e-3)


def test_so3vec_rotation_is_orthogonal():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    R = np.asarray(so3.so3vec_to_rotation(w))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.eye(3)[None].repeat(16, 0), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_construct_3d_basis_orthonormal():
    rng = np.random.default_rng(2)
    c, p1, p2 = [jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
                 for _ in range(3)]
    R = np.asarray(construct_3d_basis(c, p1, p2))
    eye = np.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(eye, np.eye(3)[None].repeat(8, 0), atol=1e-4)


def test_local_global_roundtrip():
    rng = np.random.default_rng(3)
    R = jnp.asarray(_random_rotations(4, seed=3).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(4, 7, 3)).astype(np.float32))
    q = local_to_global(R, t, p)
    p2 = global_to_local(R, t, q)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-5)


def test_dihedral_known_values():
    # cis (0) and trans (pi) configurations around the z axis
    p1 = jnp.array([0.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 0.0, 1.0])
    p0 = jnp.array([1.0, 0.0, 0.0])
    p3_cis = jnp.array([1.0, 0.0, 1.0])
    p3_trans = jnp.array([-1.0, 0.0, 1.0])
    assert abs(float(dihedral_from_four_points(p0, p1, p2, p3_cis))) < 1e-2
    assert abs(abs(float(dihedral_from_four_points(p0, p1, p2, p3_trans)))
               - np.pi) < 1e-2


def test_angular_distribution_sampling():
    dist = so3.AngularDistribution.create([0.05, 0.5, 1.5], num_bins=512,
                                          num_iters=256)
    key = jax.random.PRNGKey(0)
    idx = jnp.asarray(np.array([0, 1, 2] * 300))
    samples = np.asarray(dist.sample(key, idx))
    assert (samples >= 0).all() and (samples <= np.pi).all()
    # larger stddev -> larger mean angle
    m0 = samples[idx == 0].mean()
    m2 = samples[idx == 2].mean()
    assert m2 > m0 + 0.3


def test_random_normal_so3_shapes():
    dist = so3.AngularDistribution.create([0.3] * 4, num_bins=256,
                                          num_iters=128)
    w = so3.random_normal_so3(jax.random.PRNGKey(1),
                              jnp.zeros((2, 5), jnp.int32), dist)
    assert w.shape == (2, 5, 3)
    assert np.isfinite(np.asarray(w)).all()
