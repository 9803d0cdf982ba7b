"""Triangulation — two-view and padded N-view DLT with Gauss-Newton polish.

Reference: `triangulate` / `triangulate_n` / `triangulate_n_refine`
(`lib/imagelib/triangulate.c`), drivers `Triangulate` / `TriangulateNViews`
(`src/BundleAdd.cpp:47-127, 430-`).

Ray convention: a camera with world→cam rotation R and w2c translation
t (= -R·c) sees world point X at direction (R X + t) ∝ (px, py, 1) where
(px, py) = (-u/f, -v/f) are the NEGATED normalized image coords — the -z
viewing axis again (`src/BundleAdd.cpp:82`).

The TPU shape: tracks are padded to a fixed view count M; the per-track
3x3 normal equations are built and solved vmapped, then polished with a
fixed number of masked Gauss-Newton steps (replacing the lmdif polish).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from bundler_sfm_tpu.ops.ransac import exact_matmuls

from bundler_sfm_tpu.ops.linalg_small import solve3


def _linear_triangulate(pv: jnp.ndarray, Rs: jnp.ndarray, ts: jnp.ndarray,
                        mask: jnp.ndarray) -> jnp.ndarray:
    """Masked linear triangulation for one track.

    pv [M,2] negated-normalized points, Rs [M,3,3], ts [M,3] (w2c), mask [M].
    Rows (triangulate_n, lib/imagelib/triangulate.c):
        (R0 - px·R2)·X = t2·px - t0
        (R1 - py·R2)·X = t2·py - t1
    """
    w = mask.astype(pv.dtype)
    r0, r1, r2 = Rs[:, 0, :], Rs[:, 1, :], Rs[:, 2, :]
    px, py = pv[:, 0:1], pv[:, 1:2]
    A = jnp.concatenate([r0 - px * r2, r1 - py * r2], axis=0)        # [2M,3]
    b = jnp.concatenate([ts[:, 2] * pv[:, 0] - ts[:, 0],
                         ts[:, 2] * pv[:, 1] - ts[:, 1]], axis=0)    # [2M]
    ww = jnp.concatenate([w, w], axis=0)
    Aw = A * ww[:, None]
    AtA = Aw.T @ A + 1e-12 * jnp.eye(3, dtype=pv.dtype)
    return solve3(AtA, Aw.T @ b)


def _gn_polish(X0, pv, Rs, ts, mask, num_iters: int):
    """Masked Gauss-Newton on the normalized reprojection residual
    (replaces the lmdif polish at `triangulate.c` `triangulate_n`)."""
    w = mask.astype(X0.dtype)

    def residuals(X):
        q = Rs @ X + ts                     # [M,3]
        pred = q[:, 0:2] / q[:, 2:3]
        return ((pred - pv) * w[:, None]).reshape(-1)

    def step(X, _):
        J = jax.jacfwd(residuals)(X)        # [2M,3]
        r = residuals(X)
        JtJ = J.T @ J + 1e-12 * jnp.eye(3, dtype=X.dtype)
        Xn = X - solve3(JtJ, J.T @ r)
        better = jnp.sum(residuals(Xn) ** 2) < jnp.sum(r ** 2)
        return jnp.where(better, Xn, X), None

    X, _ = jax.lax.scan(step, X0, None, length=num_iters)
    return X


@exact_matmuls
def triangulate_track(pv, Rs, ts, mask, num_polish: int = 5):
    """Triangulate one padded track; returns (X, rms_normalized_error)."""
    X = _linear_triangulate(pv, Rs, ts, mask)
    X = _gn_polish(X, pv, Rs, ts, mask, num_polish)
    q = Rs @ X + ts
    pred = q[:, 0:2] / q[:, 2:3]
    w = mask.astype(X.dtype)
    err = jnp.sum(jnp.sum((pred - pv) ** 2, axis=1) * w) / jnp.maximum(
        jnp.sum(w), 1.0)
    return X, jnp.sqrt(err)


triangulate_tracks = jax.jit(
    jax.vmap(triangulate_track, in_axes=(0, 0, 0, 0, None)),
    static_argnames=("num_polish",))


@functools.partial(jax.jit, static_argnames=("num_polish",))
@exact_matmuls
def triangulate_tracks_pixels(xy, fs, ks, Rs, centers, mask,
                              num_polish: int = 5):
    """N-view triangulation from PIXEL observations + full cameras.

    xy [T,M,2] centered pixel coords; fs [T,M]; ks [T,M,2] (k1,k2 — undone
    via the small-distortion inverse, cf. `UndistortNormalizedPoint` usage in
    `src/BundleAdd.cpp:83`); Rs [T,M,3,3]; centers [T,M,3]; mask [T,M].
    Returns (X [T,3], rms PIXEL reprojection error [T] — the quantity
    TriangulateNViews returns, `src/BundleAdd.cpp:98-120`).
    """
    # Normalized, negated coords.
    un = xy / fs[..., None]                     # [T,M,2] u/f
    # Invert distortion approximately: r_d = r(1+k1 r²+k2 r⁴) ⇒ iterate twice.
    r2 = jnp.sum(un * un, axis=-1, keepdims=True)
    for _ in range(2):
        factor = 1.0 + ks[..., 0:1] * r2 + ks[..., 1:2] * r2 * r2
        r2 = jnp.sum((un / factor) ** 2, axis=-1, keepdims=True)
    factor = 1.0 + ks[..., 0:1] * r2 + ks[..., 1:2] * r2 * r2
    pv = -(un / factor)
    ts = -jnp.einsum("tmij,tmj->tmi", Rs, centers)   # w2c translation
    X, _ = jax.vmap(triangulate_track, in_axes=(0, 0, 0, 0, None))(
        pv, Rs, ts, mask, num_polish)
    # Pixel-space reprojection error with distortion applied
    # (sfm_project_final, lib/sfm-driver/sfm.c:118-155).
    q = jnp.einsum("tmij,tmj->tmi", Rs, X[:, None, :] - centers)
    pred = -fs[..., None] * q[..., 0:2] / q[..., 2:3]
    rr = jnp.sum(pred * pred, axis=-1, keepdims=True) / (fs[..., None] ** 2)
    pred = pred * (1.0 + ks[..., 0:1] * rr + ks[..., 1:2] * rr * rr)
    w = mask.astype(xy.dtype)
    err = jnp.sum(jnp.sum((pred - xy) ** 2, axis=-1) * w, axis=1) / jnp.maximum(
        jnp.sum(w, axis=1), 1.0)
    return X, jnp.sqrt(err)


@exact_matmuls
def triangulate_two_view(p_n, q_n, R1, t1, R2, t2, num_polish: int = 5):
    """Two-view triangulation in negated-normalized coords with w2c
    translations (reference `triangulate`, used by `find_extrinsics_essential`
    and `Triangulate`).  Returns (X, sum of squared normalized errors)."""
    pv = jnp.stack([p_n, q_n])
    Rs = jnp.stack([R1, R2])
    ts = jnp.stack([t1, t2])
    mask = jnp.ones(2, dtype=bool)
    X, rms = triangulate_track(pv, Rs, ts, mask, num_polish)
    return X, rms
