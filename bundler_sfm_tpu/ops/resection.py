"""Camera resection — batched 6-point DLT RANSAC + RQ verification.

Reference: `find_projection_3x4_ransac` (`lib/imagelib/triangulate.c`,
4096 rounds @ 4.0 px — `src/Bundle.cpp:2901-2904`) and `FindAndVerifyCamera`
(`src/Bundle.cpp:2887-2990`): DLT for P, RQ split into K·R, sign fixing,
cheirality-gated inlier counting with a strong and a weak threshold.

Projection convention: image = (-q0/q2, -q1/q2) for q = P·[X;1]
(`find_projection_3x4_ransac` scoring), matching the -z camera axis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundler_sfm_tpu.ops.linalg_small import cholesky_solve, solve3
from bundler_sfm_tpu.ops.ransac import (
    exact_matmuls, sample_indices, selection_matrix,
)
from bundler_sfm_tpu.ops.rotations import rq3, fix_intrinsics_sign


def fit_projection_dlt(X: jnp.ndarray, x: jnp.ndarray,
                       mask: jnp.ndarray) -> jnp.ndarray:
    """(Weighted) DLT for the 3x4 projection matrix.

    X: [N,3] world points, x: [N,2] image points; rows weighted by mask.
    Homogeneous system: row1·Xh + u·row3·Xh = 0, row2·Xh + v·row3·Xh = 0
    (image = -q.xy/q.z).  Solved by smallest eigenvector of AᵀA (12x12).
    """
    w = mask.astype(X.dtype)
    # Hartley normalization of BOTH sides: the raw-pixel DLT normal matrix
    # has condition ~1e10, beyond what any fixed-damping smallest-eigenvector
    # method (and f32 generally) can resolve; normalized it is ~1e3-1e4.
    count = jnp.maximum(jnp.sum(w), 1.0)
    cX = jnp.sum(X * w[:, None], axis=0) / count
    dX = jnp.sqrt(jnp.sum((X - cX) ** 2, axis=1) + 1e-300)
    sX = jnp.sqrt(jnp.asarray(3.0, X.dtype)) / jnp.maximum(
        jnp.sum(dX * w) / count, 1e-12)
    Xn = (X - cX) * sX
    cx = jnp.sum(x * w[:, None], axis=0) / count
    dx = jnp.sqrt(jnp.sum((x - cx) ** 2, axis=1) + 1e-300)
    sx = jnp.sqrt(jnp.asarray(2.0, X.dtype)) / jnp.maximum(
        jnp.sum(dx * w) / count, 1e-12)
    xn = (x - cx) * sx

    Xh = jnp.concatenate([Xn, jnp.ones_like(Xn[:, :1])], axis=1)  # [N,4]
    u = xn[:, 0:1]
    v = xn[:, 1:2]
    zero = jnp.zeros_like(Xh)
    rows1 = jnp.concatenate([Xh, zero, u * Xh], axis=1)   # [N,12]
    rows2 = jnp.concatenate([zero, Xh, v * Xh], axis=1)
    A = jnp.concatenate([rows1, rows2], axis=0)           # [2N,12]
    ww = jnp.concatenate([w, w], axis=0)
    Aw = A * ww[:, None]
    AtA = Aw.T @ A
    # Smallest eigenvector via batched eigh ON THE NORMALIZED system —
    # measured faster than unrolled inverse iteration here (the 12×12
    # Cholesky/substitution chains are dependency-latency-bound under vmap,
    # 18.2 s vs 8.6 s for the 128-image resection stage), and the
    # normalization already fixed the raw-pixel conditioning that made the
    # old eigh fit inaccurate.
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[:, 0]
    Pn = p.reshape(3, 4)
    # Un-normalize: with the NEGATED image convention y ∝ diag(−1,−1,1)·PXh
    # (D below), ỹ = T2·y ⇒ P = D·T2⁻¹·D·P̃·T3, i.e. T2⁻¹ with its
    # translation column negated by the D-conjugation.
    T2inv = jnp.array([[1.0 / sx, 0.0, -cx[0]],
                       [0.0, 1.0 / sx, -cx[1]],
                       [0.0, 0.0, 1.0]], dtype=X.dtype)
    T3 = jnp.concatenate([
        sX * jnp.concatenate([jnp.eye(3, dtype=X.dtype),
                              (-cX)[:, None]], axis=1),
        jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=X.dtype)], axis=0)
    return T2inv @ Pn @ T3


def projection_residual_cheirality(P: jnp.ndarray, X: jnp.ndarray,
                                   x: jnp.ndarray):
    """Reprojection distance per point, +inf where cheirality fails.

    The reference fixes the DLT's global sign ambiguity via the RQ-diagonal
    parity of P[:, :3] (`find_projection_3x4_ransac`, "Fix the sign on the P
    matrix").  For a physical camera (K diag > 0, det R = +1) that parity
    equals sign(det P[:, :3]) — we use the determinant directly, which is
    independent of any RQ sign convention.
    """
    sign = jnp.sign(jnp.linalg.det(P[:, 0:3]))
    sign = jnp.where(sign == 0, 1.0, sign)
    Xh = jnp.concatenate([X, jnp.ones_like(X[:, :1])], axis=1)
    q = Xh @ P.T
    behind = sign * q[:, 2] > 0.0
    pred = -q[:, 0:2] / q[:, 2:3]
    dist = jnp.sqrt(jnp.sum((pred - x) ** 2, axis=1))
    return jnp.where(behind, jnp.inf, dist)


@functools.partial(jax.jit, static_argnames=("num_rounds",))
@exact_matmuls
def find_projection_ransac(key, X, x, n_valid, threshold,
                           num_rounds: int = 4096):
    """RANSAC P from padded 2D-3D correspondences; threshold in px
    (reference compares squared dist to thresh², same test).
    Returns (P, inlier_mask, num_inliers).

    TPU shape of the hypothesis stage (same rework as
    `fmatrix.estimate_fmatrix_ransac`): Hartley normalization is GLOBAL, so
    each 6-point sample's 12×12 DLT normal matrix is a 0/1-selection sum of
    precomputed per-correspondence outer products — ONE [R,N]×[N,144] MXU
    matmul for all R rounds, no per-sample gathers.  The minimal system is
    solved INHOMOGENEOUSLY with P̃[2,3] = 1 (batched 11×11 Cholesky instead
    of the [R,12,12] eigh that dominated the vmapped fit): after centering,
    the true P̃[2,3] is the camera-frame depth of the valid points' centroid
    — a convex combination of strictly-signed point depths, so it is
    bounded away from zero for any camera that passes cheirality.  The
    all-inlier polish below keeps the homogeneous eigh fit."""
    N = X.shape[0]
    dtype = X.dtype
    valid = jnp.arange(N) < n_valid
    w = valid.astype(dtype)
    count = jnp.maximum(jnp.sum(w), 1.0)
    # Global Hartley normalization — identical formulas to
    # fit_projection_dlt, computed once over the valid set.
    cX = jnp.sum(X * w[:, None], axis=0) / count
    dX = jnp.sqrt(jnp.sum((X - cX) ** 2, axis=1) + 1e-300)
    sX = jnp.sqrt(jnp.asarray(3.0, dtype)) / jnp.maximum(
        jnp.sum(dX * w) / count, 1e-12)
    Xn = (X - cX) * sX
    cx = jnp.sum(x * w[:, None], axis=0) / count
    dx = jnp.sqrt(jnp.sum((x - cx) ** 2, axis=1) + 1e-300)
    sx = jnp.sqrt(jnp.asarray(2.0, dtype)) / jnp.maximum(
        jnp.sum(dx * w) / count, 1e-12)
    xn = (x - cx) * sx

    Xh = jnp.concatenate([Xn, jnp.ones_like(Xn[:, :1])], axis=1)   # [N,4]
    u = xn[:, 0:1]
    v = xn[:, 1:2]
    zero = jnp.zeros_like(Xh)
    r1 = jnp.concatenate([Xh, zero, u * Xh], axis=1)               # [N,12]
    r2 = jnp.concatenate([zero, Xh, v * Xh], axis=1)
    outer = (r1[:, :, None] * r1[:, None, :]
             + r2[:, :, None] * r2[:, None, :]).reshape(N, 144)
    samples = sample_indices(key, num_rounds, 6, n_valid, N)
    sel = selection_matrix(samples, N, dtype)
    M = (sel @ outer).reshape(num_rounds, 12, 12)
    # Inhomogeneous solve with p̃[11] = 1 (trace-scaled damping keeps the
    # f32 Cholesky finite on near-degenerate samples; NaN/inf hypotheses
    # score zero inliers below).
    tr = jnp.trace(M[:, :11, :11], axis1=1, axis2=2)
    A11 = M[:, :11, :11] + (1e-9 / 11.0) * tr[:, None, None] \
        * jnp.eye(11, dtype=dtype)
    b11 = -M[:, :11, 11]
    p11 = jax.vmap(cholesky_solve)(A11, b11)
    Pn = jnp.concatenate([p11, jnp.ones((num_rounds, 1), dtype)],
                         axis=1).reshape(num_rounds, 3, 4)
    # Shared un-normalization (see fit_projection_dlt for the D-conjugated
    # T2⁻¹ derivation).
    T2inv = jnp.array([[1.0 / sx, 0.0, -cx[0]],
                       [0.0, 1.0 / sx, -cx[1]],
                       [0.0, 0.0, 1.0]], dtype=dtype)
    T3 = jnp.concatenate([
        sX * jnp.concatenate([jnp.eye(3, dtype=dtype),
                              (-cX)[:, None]], axis=1),
        jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=dtype)], axis=0)
    Ph = jnp.einsum("ij,rjk,kl->ril", T2inv, Pn, T3)
    resid_all = jax.vmap(
        lambda Pi: projection_residual_cheirality(Pi, X, x))(Ph)
    ok = jnp.isfinite(resid_all) & (resid_all < threshold) & valid[None, :]
    counts = jnp.sum(ok, axis=1)
    best = jnp.argmax(counts)
    P = Ph[best]
    inl = ok[best]
    cnt = counts[best]
    # Polish on inliers (reference refits + lmdif-polishes inside
    # find_projection_3x4_ransac's final stage).
    P2 = fit_projection_dlt(X, x, inl)
    r2 = projection_residual_cheirality(P2, X, x)
    valid = jnp.arange(X.shape[0]) < n_valid
    inl2 = valid & (r2 < threshold)
    better = jnp.sum(inl2) >= cnt
    P_out = jnp.where(better, P2, P)
    inl_out = jnp.where(better, inl2, inl)
    return P_out, inl_out, jnp.maximum(jnp.sum(inl2), cnt)


class VerifiedCamera(NamedTuple):
    ok: jnp.ndarray        # bool
    K: jnp.ndarray         # [3,3] intrinsics (K22 = 1)
    R: jnp.ndarray         # [3,3]
    t: jnp.ndarray         # [3] world->cam translation (center = -Rᵀt)
    inliers: jnp.ndarray       # strong inliers (< threshold)
    inliers_weak: jnp.ndarray  # weak inliers (< weak threshold)


@functools.partial(jax.jit, static_argnames=("num_rounds",))
@exact_matmuls
def find_and_verify_camera(key, X, x, n_valid, threshold, weak_threshold,
                           num_rounds: int = 4096,
                           min_inliers: int = 6) -> VerifiedCamera:
    """TPU analogue of `FindAndVerifyCamera` (`src/Bundle.cpp:2887-2990`).

    threshold = m_projection_estimation_threshold (4.0),
    weak_threshold = 16x that (`src/Bundle.cpp:3095-3096`),
    min_inliers = MIN_INLIERS_EST_PROJECTION (6, `src/Bundle.cpp:1572`).
    """
    P, _, cnt = find_projection_ransac(key, X, x, n_valid, threshold,
                                       num_rounds=num_rounds)
    # Normalize the DLT's global sign so det(P3) > 0 — then the RQ split
    # yields K with positive diagonal and a proper rotation (det +1).
    sgn = jnp.sign(jnp.linalg.det(P[:, 0:3]))
    P = P * jnp.where(sgn == 0, 1.0, sgn)
    K, Q = rq3(P[:, 0:3])
    K, R = fix_intrinsics_sign(K, Q)
    t = solve3(K, P[:, 3])
    # Reference normalizes K by K[2,2] after FixIntrinsics
    # (src/Bundle.cpp:2928); t must come from the unnormalized K·[R|t]=P.
    K = K / K[2, 2]

    # q = [R|t]·[X;1]; q2 = K·q; pimg = -q2.xy/q2.z  (src/Bundle.cpp:2940-2955)
    q = X @ R.T + t[None, :]
    q2 = q @ K.T
    pred = -q2[:, 0:2] / q2[:, 2:3]
    diff = jnp.sqrt(jnp.sum((pred - x) ** 2, axis=1))
    valid = jnp.arange(X.shape[0]) < n_valid
    inliers = valid & (diff < threshold)
    inliers_weak = valid & (diff < weak_threshold)
    num_behind = jnp.sum(valid & (q[:, 2] > 0.0))
    # "camera is pointing away from scene" (src/Bundle.cpp:2979-2983)
    ok = (cnt > min_inliers) & (num_behind < 0.9 * n_valid)
    return VerifiedCamera(ok=ok, K=K, R=R, t=t,
                          inliers=inliers, inliers_weak=inliers_weak)
