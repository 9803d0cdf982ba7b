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
from bundler_sfm_tpu.ops.ransac import exact_matmuls, hartley_normalize, run_ransac


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
    `src/BundlerApp.h:61`). Returns (H, inlier_mask, num_inliers)."""
    def fit(s1, s2):
        m = jnp.ones(s1.shape[0], dtype=bool)
        return fit_homography_dlt(s1, s2, m)

    def resid(H, a1, a2):
        return homography_transfer_dist(H, a1, a2)

    H, inl, cnt = run_ransac(key, fit, resid, p1, p2, n_valid,
                             num_rounds, 4, threshold)
    # Reference refits with least squares on the best model's inliers
    # (src/Register.cpp:147-149) and returns the pre-refit inlier set.
    H2 = fit_homography_dlt(p1, p2, inl)
    return H2, inl, cnt
