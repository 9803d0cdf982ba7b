"""Unit tests for the TPU-safe small linear algebra (ops/linalg_small.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from bundler_sfm_tpu.ops.linalg_small import (
    cholesky_solve, cholesky_unrolled, inv3, qr3, solve3,
)


def test_cholesky_solve_matches_numpy(rng):
    for n in (3, 8, 9):
        M = rng.normal(size=(n, n))
        A = M @ M.T + n * np.eye(n)
        b = rng.normal(size=n)
        x = np.asarray(cholesky_solve(jnp.asarray(A), jnp.asarray(b)))
        np.testing.assert_allclose(x, np.linalg.solve(A, b),
                                   rtol=1e-10, atol=1e-12)
        L = np.asarray(cholesky_unrolled(jnp.asarray(A)))
        np.testing.assert_allclose(L @ L.T, A, rtol=1e-10, atol=1e-12)


def test_cholesky_solve_vmaps(rng):
    M = rng.normal(size=(32, 8, 8))
    A = np.einsum("bij,bkj->bik", M, M) + 8 * np.eye(8)
    b = rng.normal(size=(32, 8))
    x = np.asarray(jax.vmap(cholesky_solve)(jnp.asarray(A), jnp.asarray(b)))
    ref = np.stack([np.linalg.solve(A[i], b[i]) for i in range(32)])
    np.testing.assert_allclose(x, ref, rtol=1e-9, atol=1e-11)


def test_inv3_solve3(rng):
    A = rng.normal(size=(3, 3)) + 3 * np.eye(3)
    b = rng.normal(size=3)
    np.testing.assert_allclose(np.asarray(inv3(jnp.asarray(A))),
                               np.linalg.inv(A), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(solve3(jnp.asarray(A),
                                                 jnp.asarray(b))),
                               np.linalg.solve(A, b), rtol=1e-10, atol=1e-12)


def test_qr3(rng):
    A = rng.normal(size=(3, 3)) + 2 * np.eye(3)
    Q, R = qr3(jnp.asarray(A))
    Q, R = np.asarray(Q), np.asarray(R)
    np.testing.assert_allclose(Q @ R, A, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(Q.T @ Q, np.eye(3), rtol=1e-10, atol=1e-12)
    assert np.all(np.diag(R) > 0)
    assert np.allclose(np.tril(R, -1), 0.0)


def test_lu_solve_general(rng):
    from bundler_sfm_tpu.ops.linalg_small import lu_solve
    for n in (3, 10):
        A = rng.normal(size=(n, n))
        B = rng.normal(size=(n, n))
        X = np.asarray(lu_solve(jnp.asarray(A), jnp.asarray(B)))
        np.testing.assert_allclose(X, np.linalg.solve(A, B),
                                   rtol=1e-8, atol=1e-10)
        b = rng.normal(size=n)
        x = np.asarray(lu_solve(jnp.asarray(A), jnp.asarray(b)))
        np.testing.assert_allclose(x, np.linalg.solve(A, b),
                                   rtol=1e-8, atol=1e-10)
    # Needs pivoting: zero leading pivot.
    A = np.array([[0.0, 1.0], [1.0, 0.0]])
    b = np.array([2.0, 3.0])
    x = np.asarray(lu_solve(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, [3.0, 2.0], atol=1e-12)
