"""Fundamental / essential matrix estimation — batched 8-point RANSAC.

Reference: `lib/imagelib/fmatrix.c` (`estimate_fmatrix_linear`,
`estimate_fmatrix_ransac_matches`, `fmatrix_compute_residual`,
`refine_fmatrix_nonlinear_matches`) driven by `src/Epipolar.cpp:118-237`.

Same algorithm, reshaped: all RANSAC hypotheses are fit as one batched
linear solve on the MXU and scored with a single [rounds, N] contraction.
The residual is the reference's symmetric epipolar distance
(`fmatrix.c:63-88`):

    e(F; r, l) = (rᵀ F l)² · (1/|F l|²_xy + 1/|Fᵀ r|²_xy)

Convention note: the reference calls `estimate_fmatrix_ransac_matches(k2_pts,
k1_pts, ...)` — image-2 points are "r", image-1 points are "l", and the
returned F satisfies  r ≈ image2, l ≈ image1:  x2ᵀ F x1 = 0.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp

from bundler_sfm_tpu.ops.linalg_small import cholesky_solve
from bundler_sfm_tpu.ops.ransac import (
    exact_matmuls, hartley_normalize, sample_indices, selection_matrix,
)


def fmatrix_residual(F: jnp.ndarray, r: jnp.ndarray, l: jnp.ndarray) -> jnp.ndarray:
    """Symmetric epipolar residual, batched over points.

    r, l: [..., 2] inhomogeneous points (z=1 implied). Returns [...]."""
    rh = jnp.concatenate([r, jnp.ones_like(r[..., :1])], axis=-1)
    lh = jnp.concatenate([l, jnp.ones_like(l[..., :1])], axis=-1)
    Fl = lh @ F.T             # [..., 3] = F @ l
    Ftr = rh @ F              # [..., 3] = Fᵀ @ r
    pt = jnp.sum(rh * Fl, axis=-1)
    d1 = Fl[..., 0] ** 2 + Fl[..., 1] ** 2
    d2 = Ftr[..., 0] ** 2 + Ftr[..., 1] ** 2
    return (1.0 / jnp.maximum(d1, 1e-300) + 1.0 / jnp.maximum(d2, 1e-300)) * pt * pt


def _closest_rank2(F: jnp.ndarray, essential: bool) -> jnp.ndarray:
    """Rank-2 projection U·diag(σ₁,σ₂,0)·Vᵀ; for essential also force equal
    singular values (reference `closest_rank2_matrix` /
    `closest_rank2_matrix_ssv`).  svd_small routes 3×3 through the
    closed-form eigh3x3, which is what made the vmapped RANSAC fits fast
    (the XLA iterative eigh was 77 % of the batched fit).

    HISTORY (round-4 bisect): a prior fast path computed the plain-F case
    as F(I − v₃v₃ᵀ) from the smallest eigenvector only.  Algebraically
    identical to the recompose (A·(v₁v₁ᵀ+v₂v₂ᵀ) with orthogonal V), its
    f32 rounding profile differs near the 9-px inlier threshold, and that
    alone drifted the deterministic kermit reconstruction 0.34 → 0.49 px
    through shifted surviving match sets.  The recompose measures the SAME
    speed on chip (331 vs 355 ms per 128-pair × 2048-round verification
    dispatch) — keep the formula whose downstream behavior matches the
    reference, and let the kermit golden gate (err < 0.55 px,
    tests/test_kermit_golden.py) catch any recurrence."""
    from bundler_sfm_tpu.ops.svd_utils import svd_small
    U, S, Vt = svd_small(F)
    if essential:
        sm = 0.5 * (S[0] + S[1])
        S2 = jnp.array([sm, sm, 0.0], dtype=F.dtype)
    else:
        S2 = jnp.array([S[0], S[1], 0.0], dtype=F.dtype)
    return (U * S2[None, :]) @ Vt


def fit_fmatrix_linear(r: jnp.ndarray, l: jnp.ndarray, mask: jnp.ndarray,
                       essential: bool) -> jnp.ndarray:
    """Normalized (weighted) 8-point fit.  r,l: [N,2]; mask selects rows.

    Mirrors `estimate_fmatrix_linear` (`lib/imagelib/fmatrix.c`): Hartley
    normalization, inhomogeneous solve with F33=1, un-normalize, rank-2 (or
    equal-singular-value) projection.  Solved via normal equations so a
    single code path serves both the 8-point minimal sample and the
    all-inlier refit.
    """
    w = mask.astype(r.dtype)
    rn, Tr = hartley_normalize(r, mask)
    ln, Tl = hartley_normalize(l, mask)
    u, v = ln[:, 0], ln[:, 1]
    up, vp = rn[:, 0], rn[:, 1]
    A = jnp.stack([u * up, v * up, up, u * vp, v * vp, vp, u, v], axis=1)
    b = -jnp.ones_like(u)
    Aw = A * w[:, None]
    AtA = Aw.T @ A + 1e-12 * jnp.eye(8, dtype=r.dtype)
    Atb = Aw.T @ b
    X = cholesky_solve(AtA, Atb)
    Fn = jnp.concatenate([X, jnp.ones((1,), dtype=r.dtype)]).reshape(3, 3)
    F = Tr.T @ Fn @ Tl
    return _closest_rank2(F, essential)


@functools.partial(jax.jit, static_argnames=("num_rounds", "essential"))
@exact_matmuls
def estimate_fmatrix_ransac(key, x1, x2, n_valid, threshold,
                            num_rounds: int = 2048, essential: bool = False):
    """RANSAC F (or E) from padded correspondences.

    x1/x2: [N,2] image-1 / image-2 points (padded).  Scoring threshold is on
    the symmetric epipolar residual (reference uses threshold=9.0 px for F —
    NOT squared — `src/BundlerApp.h:63`, `src/Epipolar.cpp:157`).
    Returns (F, inlier_mask, num_inliers) with x2ᵀ F x1 = 0.

    TPU shape of the hypothesis stage: Hartley normalization is GLOBAL (all
    valid correspondences) instead of per-8-point-sample, so each
    hypothesis's 9×9 normal matrix is a 0/1-selection sum of precomputed
    per-correspondence outer products — ONE [R,N]×[N,81] MXU matmul for all
    R rounds, no per-sample coordinate gathers (the gather was ~80 % of the
    fit cost on TPU).  Statistically equivalent to the reference's
    per-sample normalization; the final all-inlier refit below is
    unchanged."""
    N = x1.shape[0]
    dtype = x1.dtype
    valid = jnp.arange(N) < n_valid
    # fit_fmatrix_linear(r=s2, l=s1): r = image-2 = "rn", l = image-1.
    rn, Tr = hartley_normalize(x2, valid)
    ln, Tl = hartley_normalize(x1, valid)
    u, v = ln[:, 0], ln[:, 1]
    up, vp = rn[:, 0], rn[:, 1]
    a = jnp.stack([u * up, v * up, up, u * vp, v * vp, vp, u, v,
                   jnp.ones_like(u)], axis=1)              # [N,9]
    Pouter = (a[:, :, None] * a[:, None, :]).reshape(N, 81)
    samples = sample_indices(key, num_rounds, 8, n_valid, N)   # [R,8]
    sel = selection_matrix(samples, N, dtype)
    M = (sel @ Pouter).reshape(num_rounds, 9, 9)
    AtA = M[:, :8, :8] + 1e-12 * jnp.eye(8, dtype=dtype)
    Atb = -M[:, :8, 8]
    X = jax.vmap(cholesky_solve)(AtA, Atb)
    Fn = jnp.concatenate([X, jnp.ones((num_rounds, 1), dtype)],
                         axis=1).reshape(num_rounds, 3, 3)
    Fh = jnp.einsum("ij,rjk,kl->ril", Tr.T, Fn, Tl)
    Fh = jax.vmap(lambda f: _closest_rank2(f, essential))(Fh)
    # Score all hypotheses: [R, N] symmetric epipolar residuals.
    resid_all = jax.vmap(lambda f: fmatrix_residual(f, x2, x1))(Fh)
    ok = jnp.isfinite(resid_all) & (resid_all < threshold) & valid[None, :]
    counts = jnp.sum(ok, axis=1)
    best = jnp.argmax(counts)
    F = Fh[best]
    inl = ok[best]
    cnt = counts[best]
    # Refit on the inliers of the best model (reference refits via NLLS for F
    # and keeps the RANSAC model for E; we do an inlier-weighted linear refit
    # followed by Gauss-Newton polish for the F case).
    F2 = fit_fmatrix_linear(x2, x1, inl, essential)
    r2 = fmatrix_residual(F2, x2, x1)
    valid = jnp.arange(x1.shape[0]) < n_valid
    inl2 = valid & jnp.isfinite(r2) & (r2 < threshold)
    # Keep whichever model explains more points (refit can regress when the
    # inlier set is small/degenerate).
    better = jnp.sum(inl2) >= cnt
    F_out = jnp.where(better, F2, F)
    inl_out = jnp.where(better, inl2, inl)
    return F_out, inl_out, jnp.maximum(jnp.sum(inl2), cnt)


@exact_matmuls
def refine_fmatrix_nonlinear(F0: jnp.ndarray, x1, x2, mask,
                             num_iters: int = 10) -> jnp.ndarray:
    """Gauss-Newton polish of F on its inliers, minimizing the symmetric
    epipolar residual (role of `refine_fmatrix_nonlinear_matches`,
    `lib/imagelib/fmatrix.h:63-77`).  F kept unit-norm; rank-2 projected at
    the end."""
    w = mask.astype(F0.dtype)

    def residuals(fvec):
        F = fvec.reshape(3, 3)
        return jnp.sqrt(jnp.maximum(fmatrix_residual(F, x2, x1), 1e-300)) * w

    def step(fvec, _):
        J = jax.jacfwd(residuals)(fvec)          # [N, 9]
        r = residuals(fvec)
        JtJ = J.T @ J + 1e-9 * jnp.eye(9, dtype=fvec.dtype)
        delta = cholesky_solve(JtJ, J.T @ r)
        fnew = fvec - delta
        fnew = fnew / jnp.maximum(jnp.linalg.norm(fnew), 1e-12)
        improved = jnp.sum(residuals(fnew) ** 2) < jnp.sum(r ** 2)
        return jnp.where(improved, fnew, fvec), None

    fvec = F0.reshape(9)
    fvec = fvec / jnp.maximum(jnp.linalg.norm(fvec), 1e-12)
    fvec, _ = jax.lax.scan(step, fvec, None, length=num_iters)
    return _closest_rank2(fvec.reshape(3, 3), essential=False)


@exact_matmuls
def estimate_ematrix(key, x1, x2, n_valid, f1, f2, threshold_px_sq,
                     num_rounds: int = 8192):
    """Essential matrix from pixel coords + known focals.

    Mirrors `EstimateEMatrix` (`src/Epipolar.cpp:37-83`): normalize each side
    by its focal length, run essential-constrained F RANSAC with threshold
    scaled by (0.5(f1+f2))².  Points are NEGATED into ray coordinates first
    (the 5-point path's sign flip, `lib/5point/5point.c` compute_pose_ransac)
    so the returned E acts on rays and decomposes directly into the
    bundler-convention pose.  Returns (E_ray, F_pixel, inliers, count); the
    pixel threshold here is m_fmatrix_threshold² = 81.0
    (`src/RelativePose.cpp:61`).
    """
    x1n = -x1 / f1
    x2n = -x2 / f2
    scale = 0.5 * (f1 + f2)
    E, inl, cnt = estimate_fmatrix_ransac(
        key, x1n, x2n, n_valid, threshold_px_sq / (scale * scale),
        num_rounds=num_rounds, essential=True)
    from bundler_sfm_tpu.ops.essential import ematrix_to_fmatrix
    F = ematrix_to_fmatrix(E, f1, f2)
    return E, F, inl, cnt
