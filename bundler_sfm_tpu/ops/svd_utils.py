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


def svd_small(A: jnp.ndarray):
    """SVD of a small [..., m, n] matrix with m >= n via eigh(AᵀA).

    Returns (U [..., m, n], s [..., n], Vt [..., n, n]) — thin SVD, singular
    values DESCENDING.  Accuracy ~sqrt(eps) near-degenerate; fine for the
    rank projections and nullspace extractions used here."""
    AtA = jnp.swapaxes(A, -1, -2) @ A
    w, V = jnp.linalg.eigh(AtA)               # ascending
    w = w[..., ::-1]
    V = V[..., ::-1]
    s = jnp.sqrt(jnp.clip(w, 0.0))
    U = A @ V / jnp.maximum(s[..., None, :], 1e-30)
    return U, s, jnp.swapaxes(V, -1, -2)


def nullspace_rows(A: jnp.ndarray, k: int) -> jnp.ndarray:
    """The k right-singular vectors of A with SMALLEST singular values,
    returned as rows [k, n] (role of taking Vt[-k:] from a full SVD)."""
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, V = jnp.linalg.eigh(AtA)                # ascending eigenvalues
    return jnp.swapaxes(V[..., :k], -1, -2)
