"""Small-matrix SVD built on symmetric eigendecomposition.

The TPU path (and in particular the axon PJRT client) handles `eigh`
robustly but crashes/lacks support for general `svd` on small matrices; all
of this framework's hot-path SVDs are tiny (3x3 E/F projections, [5,9]
nullspaces), so they are rebuilt here from eigh:

    AᵀA = V S² Vᵀ;   U = A V S⁻¹  (columns fixed up for zero singular values)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eigh3x3(A: jnp.ndarray):
    """Closed-form symmetric 3×3 eigendecomposition (ascending), the
    vectorized replacement for jnp.linalg.eigh on [..., 3, 3] batches.

    XLA's iterative eigh dominated the RANSAC verification kernels (77 % of
    the batched F-matrix fit at 262k 3×3 problems per dispatch); the
    trigonometric (Cardano) eigenvalues + cross-product eigenvectors run as
    pure elementwise VPU code.  Eigenvectors for each λ come from the pair
    of rows of (A−λI) with the largest cross product (robust near
    degeneracy); the middle vector is rebuilt orthogonal as v3×v1."""
    dtype = A.dtype
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, 1e-30)
    # det((A − qI)/p) / 2, expanded (B symmetric).
    detB = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02))
    r = jnp.clip(detB / (2.0 * safe_p ** 3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = jnp.asarray(2.0943951023931953, dtype)
    lmax = q + 2.0 * p * jnp.cos(phi)
    lmin = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    lmid = 3.0 * q - lmax - lmin
    w = jnp.stack([lmin, lmid, lmax], axis=-1)            # ascending

    eye = jnp.eye(3, dtype=dtype)

    def eigvec(lam):
        B = A - lam[..., None, None] * eye
        r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, axis=-1)
        n02 = jnp.sum(c02 * c02, axis=-1)
        n12 = jnp.sum(c12 * c12, axis=-1)
        v = jnp.where((n01 >= n02)[..., None] & (n01 >= n12)[..., None],
                      c01, jnp.where((n02 >= n12)[..., None], c02, c12))
        nv = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        # Degenerate (isotropic) fallback: any unit vector is an eigenvector.
        fallback = jnp.broadcast_to(eye[0], v.shape)
        return jnp.where(nv > 1e-30, v / jnp.maximum(nv, 1e-30), fallback)

    v_min = eigvec(lmin)
    v_max = eigvec(lmax)
    # Re-orthogonalize the extremes (they are the well-separated ones) and
    # rebuild the middle as their cross product.
    v_max = v_max - jnp.sum(v_max * v_min, axis=-1, keepdims=True) * v_min
    nmax = jnp.sqrt(jnp.sum(v_max * v_max, axis=-1, keepdims=True))
    alt = jnp.cross(v_min, jnp.broadcast_to(eye[0], v_min.shape))
    alt_n = jnp.sqrt(jnp.sum(alt * alt, axis=-1, keepdims=True))
    alt2 = jnp.cross(v_min, jnp.broadcast_to(eye[1], v_min.shape))
    alt = jnp.where(alt_n > 1e-6, alt,
                    alt2 / jnp.maximum(jnp.sqrt(jnp.sum(
                        alt2 * alt2, axis=-1, keepdims=True)), 1e-30))
    v_max = jnp.where(nmax > 1e-30, v_max / jnp.maximum(nmax, 1e-30), alt)
    v_mid = jnp.cross(v_max, v_min)
    V = jnp.stack([v_min, v_mid, v_max], axis=-1)         # columns
    return w, V


def svd_small(A: jnp.ndarray):
    """SVD of a small [..., m, n] matrix with m >= n via eigh(AᵀA)
    (closed-form for n = 3, XLA eigh otherwise).

    Returns (U [..., m, n], s [..., n], Vt [..., n, n]) — thin SVD, singular
    values DESCENDING.  Accuracy ~sqrt(eps) near-degenerate; fine for the
    rank projections and nullspace extractions used here."""
    AtA = jnp.swapaxes(A, -1, -2) @ A
    if A.shape[-1] == 3:
        w, V = eigh3x3(AtA)
    else:
        w, V = jnp.linalg.eigh(AtA)           # ascending
    w = w[..., ::-1]
    V = V[..., ::-1]
    s = jnp.sqrt(jnp.clip(w, 0.0))
    U = A @ V / jnp.maximum(s[..., None, :], 1e-30)
    return U, s, jnp.swapaxes(V, -1, -2)


def smallest_eigvec_psd(A: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """Smallest eigenvector of a small PSD [n, n] matrix by damped inverse
    iteration — ONE unrolled Cholesky factorization + `iters` triangular
    substitutions, an alternative to XLA's iterative eigh for small PSD
    systems (see fmatrix._closest_rank2 for the 3×3 closed form).  NOTE:
    the production resection DLT uses batched eigh on the Hartley-
    normalized 12×12 normal matrix instead — measured faster there
    (the substitution chains are dependency-latency-bound under vmap,
    18.2 s vs 8.6 s for the 128-image resection stage); this routine is
    kept for callers whose batch shapes favor it.

    Two deterministic starts guard against a start vector accidentally
    orthogonal to the target eigenvector; the iterate with the smaller
    Rayleigh quotient wins.  vmap over leading axes for batches."""
    from bundler_sfm_tpu.ops.linalg_small import (
        cholesky_substitute, cholesky_unrolled,
    )
    n = A.shape[-1]
    dtype = A.dtype
    tr = jnp.trace(A)
    eps = (1e-6 / n) * tr + jnp.asarray(1e-30, dtype)
    L = cholesky_unrolled(A + eps * jnp.eye(n, dtype=dtype))

    def iterate(v):
        for _ in range(iters):
            v = cholesky_substitute(L, v)
            v = v / jnp.maximum(jnp.sqrt(jnp.sum(v * v)), 1e-30)
        return v

    ones = jnp.ones((n,), dtype) / jnp.sqrt(jnp.asarray(float(n), dtype))
    alt = jnp.eye(n, dtype=dtype)[0]
    v1 = iterate(ones)
    v2 = iterate(alt)
    r1 = v1 @ (A @ v1)
    r2 = v2 @ (A @ v2)
    return jnp.where(r1 <= r2, v1, v2)


def nullspace_rows(A: jnp.ndarray, k: int) -> jnp.ndarray:
    """The k right-singular vectors of A with SMALLEST singular values,
    returned as rows [k, n] (role of taking Vt[-k:] from a full SVD)."""
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, V = jnp.linalg.eigh(AtA)                # ascending eigenvalues
    return jnp.swapaxes(V[..., :k], -1, -2)
