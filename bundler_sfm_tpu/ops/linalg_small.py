"""TPU-safe small dense linear algebra.

XLA:TPU implements LU decomposition (jnp.linalg.solve / inv) only for f32,
and the pipeline's geometry runs in f64 (jax_enable_x64; parity with the
reference's C doubles — `lib/matrix/matrix.h` drivers).  Every small solve
on the TPU path therefore goes through these trace-time-unrolled routines:
plain adds/muls/sqrts, any dtype, any backend, vmap-friendly.

Most systems solved here are symmetric positive definite by construction
(Hartley-normalized normal equations with a ridge, damped JᵀJ, Gram
matrices), so pivot-free Cholesky is exact enough and cheaper than LU.
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_unrolled(A: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of a small SPD matrix, unrolled at trace time.

    A: [n, n] with static n (intended n <= ~16).  No pivoting; callers must
    damp/ridge the matrix.  vmap over leading axes for batches.
    """
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(n):
        s = A[j, j] - (jnp.sum(L[j, :j] ** 2) if j else 0.0)
        d = jnp.sqrt(jnp.maximum(s, jnp.finfo(A.dtype).tiny))
        L = L.at[j, j].set(d)
        if j + 1 < n:
            below = A[j + 1:, j]
            if j:
                below = below - L[j + 1:, :j] @ L[j, :j]
            L = L.at[j + 1:, j].set(below / d)
    return L


def cholesky_substitute(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given the lower Cholesky factor L of A — unrolled
    forward + back substitution (reuse L across multiple right-hand sides,
    e.g. inverse iteration)."""
    n = L.shape[-1]
    y = jnp.zeros_like(b)
    for i in range(n):
        yi = b[i] - (L[i, :i] @ y[:i] if i else 0.0)
        y = y.at[i].set(yi / L[i, i])
    x = jnp.zeros_like(b)
    for i in reversed(range(n)):
        xi = y[i] - (L[i + 1:, i] @ x[i + 1:] if i + 1 < n else 0.0)
        x = x.at[i].set(xi / L[i, i])
    return x


def cholesky_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for small SPD A [n,n], b [n] — unrolled, any dtype."""
    return cholesky_substitute(cholesky_unrolled(A), b)


def lu_solve(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B for general small A [n,n], B [n] or [n,k] — unrolled
    Gaussian elimination with partial pivoting, any dtype/backend.

    Replaces jnp.linalg.solve for non-SPD systems on the TPU f64 path
    (e.g. the 5-point solver's batched 10×10 Gauss-Jordan reduction,
    `lib/5point/5point.c:80-484`)."""
    n = A.shape[-1]
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    rows = jnp.arange(n)
    for j in range(n):
        col = jnp.abs(A[:, j])
        col = jnp.where(rows < j, -jnp.inf, col)
        p = jnp.argmax(col)
        # Swap rows j and p of A and B (p is traced -> dynamic updates).
        rowj_A, rowp_A = A[j], A[p]
        A = A.at[j].set(rowp_A).at[p].set(rowj_A)
        rowj_B, rowp_B = B[j], B[p]
        B = B.at[j].set(rowp_B).at[p].set(rowj_B)
        piv = A[j, j]
        piv = jnp.where(jnp.abs(piv) < jnp.finfo(A.dtype).tiny,
                        jnp.finfo(A.dtype).tiny, piv)
        f = jnp.where(rows > j, A[:, j] / piv, 0.0)
        A = A - f[:, None] * A[j][None, :]
        B = B - f[:, None] * B[j][None, :]
    # Back substitution on the upper-triangular A.
    X = jnp.zeros_like(B)
    for i in reversed(range(n)):
        acc = B[i] - (A[i, i + 1:] @ X[i + 1:] if i + 1 < n else 0.0)
        di = A[i, i]
        di = jnp.where(jnp.abs(di) < jnp.finfo(A.dtype).tiny,
                       jnp.finfo(A.dtype).tiny, di)
        X = X.at[i].set(acc / di)
    return X[:, 0] if vec else X


def inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) inverse of a general 3×3 matrix."""
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
    adj = jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e]),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f]),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d])])
    det = a * adj[0, 0] + b * adj[1, 0] + c * adj[2, 0]
    det = jnp.where(jnp.abs(det) < jnp.finfo(A.dtype).tiny,
                    jnp.finfo(A.dtype).tiny, det)
    return adj / det


def solve3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a general 3×3 system via the adjugate (Cramer)."""
    return inv3(A) @ b


def qr3(A: jnp.ndarray):
    """QR of a nonsingular 3×3 via modified Gram-Schmidt (unrolled).

    Returns (Q, R) with R upper-triangular, diag(R) > 0.  Replaces
    jnp.linalg.qr on the TPU f64 path (used by rotations.rq3 for the
    K·R split of DLT projections, `src/Bundle.cpp:2924`)."""
    a0, a1, a2 = A[:, 0], A[:, 1], A[:, 2]
    r00 = jnp.sqrt(a0 @ a0)
    q0 = a0 / r00
    r01 = q0 @ a1
    u1 = a1 - r01 * q0
    r11 = jnp.sqrt(u1 @ u1)
    q1 = u1 / r11
    r02 = q0 @ a2
    r12 = q1 @ a2
    u2 = a2 - r02 * q0 - r12 * q1
    r22 = jnp.sqrt(u2 @ u2)
    q2 = u2 / r22
    Q = jnp.stack([q0, q1, q2], axis=1)
    z = jnp.zeros_like(r00)
    R = jnp.stack([jnp.stack([r00, r01, r02]),
                   jnp.stack([z, r11, r12]),
                   jnp.stack([z, z, r22])])
    return Q, R
