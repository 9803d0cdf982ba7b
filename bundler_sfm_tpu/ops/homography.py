"""Homography estimation — batched 4-point DLT RANSAC.

Reference: `EstimateTransform` (`src/Register.cpp:49-159`, MotionHomography,
256 rounds @ 6.0 px by default), `align_homography` (`lib/imagelib/homography.h:37`),
inlier test = one-directional transfer distance (`CountInliers`,
`src/Register.cpp:161-199`: |H·p1 - p2| <= thresh), final least-squares refit
on inliers (`LeastSquaresFit`, `src/Register.cpp:201`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bundler_sfm_tpu.ops.linalg_small import cholesky_solve, inv3
from bundler_sfm_tpu.ops.ransac import (
    exact_matmuls, hartley_normalize, sample_indices, selection_matrix,
)


def homography_transfer_dist(H: jnp.ndarray, p1: jnp.ndarray,
                             p2: jnp.ndarray) -> jnp.ndarray:
    """|project(H, p1) - p2| per point; p1/p2 [..., 2]."""
    ph = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], axis=-1)
    q = ph @ H.T
    qxy = q[..., 0:2] / jnp.where(jnp.abs(q[..., 2:3]) < 1e-300,
                                  jnp.sign(q[..., 2:3]) + 1e-300, q[..., 2:3])
    return jnp.sqrt(jnp.sum((qxy - p2) ** 2, axis=-1))


def fit_homography_dlt(p1: jnp.ndarray, p2: jnp.ndarray,
                       mask: jnp.ndarray) -> jnp.ndarray:
    """(Weighted) normalized DLT: H with p2 ~ H p1, H33 = 1.

    Inhomogeneous 8-unknown formulation (the reference's `align_homography`
    solves the same linear system).  Rows weighted by `mask` so minimal
    samples and full refits share one code path.
    """
    w = mask.astype(p1.dtype)
    p1n, T1 = hartley_normalize(p1, mask)
    p2n, T2 = hartley_normalize(p2, mask)
    x, y = p1n[:, 0], p1n[:, 1]
    xp, yp = p2n[:, 0], p2n[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    rows1 = jnp.stack([x, y, one, zero, zero, zero, -x * xp, -y * xp], axis=1)
    rows2 = jnp.stack([zero, zero, zero, x, y, one, -x * yp, -y * yp], axis=1)
    A = jnp.concatenate([rows1, rows2], axis=0)          # [2N, 8]
    b = jnp.concatenate([xp, yp], axis=0)
    ww = jnp.concatenate([w, w], axis=0)
    Aw = A * ww[:, None]
    AtA = Aw.T @ A + 1e-12 * jnp.eye(8, dtype=p1.dtype)
    Atb = Aw.T @ b
    h = cholesky_solve(AtA, Atb)
    Hn = jnp.concatenate([h, jnp.ones((1,), dtype=p1.dtype)]).reshape(3, 3)
    # Un-normalize: p2 = T2⁻¹ Hn T1 p1.
    T2inv = inv3(T2)
    H = T2inv @ Hn @ T1
    return H / H[2, 2]


@functools.partial(jax.jit, static_argnames=("num_rounds",))
@exact_matmuls
def estimate_homography_ransac(key, p1, p2, n_valid, threshold,
                               num_rounds: int = 256):
    """Batched-hypothesis homography RANSAC + inlier refit.

    p1/p2: [N,2] padded correspondences; threshold in pixels (default 6.0,
    `src/BundlerApp.h:61`). Returns (H, inlier_mask, num_inliers).

    Hypothesis stage reworked like `fmatrix.estimate_fmatrix_ransac`:
    GLOBAL Hartley normalization + precomputed per-correspondence
    normal-equation contributions, so all R 4-point fits are ONE
    [R,N]×[N,72] selection matmul + a batched 8×8 Cholesky — no per-sample
    gathers or per-sample normalization chains."""
    N = p1.shape[0]
    dtype = p1.dtype
    valid = jnp.arange(N) < n_valid
    p1n, T1 = hartley_normalize(p1, valid)
    p2n, T2 = hartley_normalize(p2, valid)
    x, y = p1n[:, 0], p1n[:, 1]
    xp, yp = p2n[:, 0], p2n[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -x * xp, -y * xp], axis=1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -x * yp, -y * yp], axis=1)
    # Per-point contribution to [AtA | Atb]: 64 + 8 entries.
    outer = jnp.concatenate(
        [(r1[:, :, None] * r1[:, None, :]
          + r2[:, :, None] * r2[:, None, :]).reshape(N, 64),
         r1 * xp[:, None] + r2 * yp[:, None]], axis=1)      # [N,72]
    samples = sample_indices(key, num_rounds, 4, n_valid, N)
    sel = selection_matrix(samples, N, dtype)
    Mfull = sel @ outer                                     # [R,72]
    AtA = Mfull[:, :64].reshape(num_rounds, 8, 8) \
        + 1e-12 * jnp.eye(8, dtype=dtype)
    Atb = Mfull[:, 64:]
    h = jax.vmap(cholesky_solve)(AtA, Atb)
    Hn = jnp.concatenate([h, jnp.ones((num_rounds, 1), dtype)],
                         axis=1).reshape(num_rounds, 3, 3)
    T2inv = inv3(T2)
    Hh = jnp.einsum("ij,rjk,kl->ril", T2inv, Hn, T1)
    Hh = Hh / Hh[:, 2:3, 2:3]
    resid_all = jax.vmap(
        lambda Hi: homography_transfer_dist(Hi, p1, p2))(Hh)
    ok = jnp.isfinite(resid_all) & (resid_all < threshold) & valid[None, :]
    counts = jnp.sum(ok, axis=1)
    best = jnp.argmax(counts)
    inl = ok[best]
    cnt = counts[best]
    # Reference refits with least squares on the best model's inliers
    # (src/Register.cpp:147-149) and returns the pre-refit inlier set.
    H2 = fit_homography_dlt(p1, p2, inl)
    return H2, inl, cnt
