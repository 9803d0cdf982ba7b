"""Batched plane / line fitting — TPU-native replacement for the reference's
orthogonal-regression RANSAC (`lib/imagelib/fit.c`):

- `fit_3D_plane_orthogonal_regression` (`fit.c:301-353`): mean-center, take
  the covariance's smallest eigenvector as the normal, d = -mean.n, and
  normalize the sign so d <= 0.
- `fit_3D_plane_ortreg_ransac` (`fit.c:379-491`): 3-point hypotheses scored
  by |point-plane distance| < threshold, then a final orthogonal regression
  over the best hypothesis's inliers.
- `fit_2D_line_ortreg_ransac` (used by `FitPlaneToPoints` when the plane
  must stay parallel to the up vector, `src/Geometry.cpp:966-990`).

Redesign: every hypothesis is a closed-form 3x3 eigen problem, so all
RANSAC rounds run as one vmapped batch and scoring is a [rounds, N]
broadcast — no data-dependent loops.  Fixed round counts, masked inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _plane_from_cov(mean, cov):
    """Normal = eigenvector of the smallest eigenvalue; d = -mean.n with the
    sign convention d <= 0 (fit.c:328-338)."""
    w, V = jnp.linalg.eigh(cov)
    n = V[:, 0]
    d = -jnp.dot(mean, n)
    flip = jnp.where(d > 0.0, -1.0, 1.0)
    return jnp.concatenate([n * flip, jnp.array([d], n.dtype) * flip])


def fit_plane_ortho(pts, mask=None):
    """Masked orthogonal-regression plane fit.  pts [N,3], mask [N] ->
    plane [4] (unit normal, offset), as `fit_3D_plane_orthogonal_regression`
    (`fit.c:301-353`)."""
    pts = jnp.asarray(pts)
    if mask is None:
        mask = jnp.ones(pts.shape[0], pts.dtype)
    m = jnp.asarray(mask, pts.dtype)
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(pts * m[:, None], axis=0) / cnt
    dev = (pts - mean) * m[:, None]
    cov = dev.T @ dev
    return _plane_from_cov(mean, cov)


def plane_point_distance(plane, pts):
    """|n.p + d| for unit-normal planes (fit.c plane_point_distance)."""
    return jnp.abs(pts @ plane[:3] + plane[3])


@functools.partial(jax.jit, static_argnames=("rounds",))
def fit_plane_ransac(key, pts, mask, threshold, rounds: int = 1024):
    """RANSAC plane fit (`fit_3D_plane_ortreg_ransac`, `fit.c:379-491`).

    pts [N,3], mask [N] validity.  All `rounds` 3-point hypotheses are
    solved and scored in one batch; the best hypothesis's inliers get a
    final orthogonal-regression refit (the reference's epilogue,
    `fit.c:463-470`).  Returns (plane [4], num_inliers, inlier_mask [N]).
    """
    pts = jnp.asarray(pts)
    N = pts.shape[0]
    m = jnp.asarray(mask, pts.dtype)

    # Sample 3 valid indices per round: weighted Gumbel top-k over the mask.
    logits = jnp.where(m > 0, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (rounds, N), dtype=pts.dtype) + logits[None]
    _, samples = jax.lax.top_k(g, 3)                        # [rounds,3]

    def hypothesis(idx):
        p3 = pts[idx]                                        # [3,3]
        mean = p3.mean(axis=0)
        dev = p3 - mean
        return _plane_from_cov(mean, dev.T @ dev)

    planes = jax.vmap(hypothesis)(samples)                  # [rounds,4]
    dist = jnp.abs(pts @ planes[:, :3].T + planes[None, :, 3])  # [N,rounds]
    inl = (dist < threshold) & (m[:, None] > 0)
    counts = jnp.sum(inl, axis=0)                           # [rounds]
    best = jnp.argmax(counts)
    best_mask = inl[:, best].astype(pts.dtype)

    plane = fit_plane_ortho(pts, best_mask)
    # Recount against the refit plane (fit.c:472-479 reports this count).
    final_inl = (plane_point_distance(plane, pts) < threshold) & (m > 0)
    return plane, jnp.sum(best_mask.astype(jnp.int32)), final_inl


def fit_line_2d_ortho(pts2, mask=None):
    """Masked orthogonal-regression 2D line fit -> [a, b, c] with unit
    (a,b), a*x + b*y + c = 0 (`fit_2D_line_orthogonal_regression`)."""
    pts2 = jnp.asarray(pts2)
    if mask is None:
        mask = jnp.ones(pts2.shape[0], pts2.dtype)
    m = jnp.asarray(mask, pts2.dtype)
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(pts2 * m[:, None], axis=0) / cnt
    dev = (pts2 - mean) * m[:, None]
    w, V = jnp.linalg.eigh(dev.T @ dev)
    n = V[:, 0]
    c = -jnp.dot(mean, n)
    return jnp.concatenate([n, jnp.array([c], n.dtype)])


@functools.partial(jax.jit, static_argnames=("rounds",))
def fit_line_2d_ransac(key, pts2, mask, threshold, rounds: int = 1024):
    """RANSAC 2D line fit (`fit_2D_line_ortreg_ransac`), batched like
    fit_plane_ransac but with 2-point hypotheses."""
    pts2 = jnp.asarray(pts2)
    N = pts2.shape[0]
    m = jnp.asarray(mask, pts2.dtype)

    logits = jnp.where(m > 0, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (rounds, N), dtype=pts2.dtype) + logits[None]
    _, samples = jax.lax.top_k(g, 2)

    def hypothesis(idx):
        p2 = pts2[idx]
        d = p2[1] - p2[0]
        n = jnp.array([-d[1], d[0]], pts2.dtype)
        n = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)
        return jnp.concatenate([n, jnp.array([-jnp.dot(n, p2[0])],
                                             pts2.dtype)])

    lines = jax.vmap(hypothesis)(samples)                   # [rounds,3]
    dist = jnp.abs(pts2 @ lines[:, :2].T + lines[None, :, 2])
    inl = (dist < threshold) & (m[:, None] > 0)
    counts = jnp.sum(inl, axis=0)
    best = jnp.argmax(counts)
    best_mask = inl[:, best].astype(pts2.dtype)

    line = fit_line_2d_ortho(pts2, best_mask)
    final_inl = (jnp.abs(pts2 @ line[:2] + line[2]) < threshold) & (m > 0)
    return line, jnp.sum(best_mask.astype(jnp.int32)), final_inl


@functools.partial(jax.jit, static_argnames=("k",))
def knn_plane_normals(pts, mask, k: int = 32):
    """Per-point normals from a plane fit to the k nearest neighbors
    (`EstimatePointNormals`, `src/BaseGeometry.cpp:1444-1594`, NUM_NNS=32).

    TPU redesign: the reference queries an ANN kd-tree point-by-point; here
    the full [N,N] squared-distance matrix is one MXU matmul
    (|a|^2+|b|^2-2ab^T), top-k per row, then batched 3x3 covariance eigen
    problems.  pts [N,3], mask [N] -> normals [N,3] (unit, smallest
    covariance eigenvector).
    """
    pts = jnp.asarray(pts)
    N = pts.shape[0]
    m = jnp.asarray(mask, pts.dtype)
    sq = jnp.sum(pts * pts, axis=1)
    D = sq[:, None] + sq[None, :] - 2.0 * (pts @ pts.T)
    D = jnp.where(m[None, :] > 0, D, jnp.inf)          # mask padding
    neg, idx = jax.lax.top_k(-D, k)                    # includes self (d=0)
    nbrs = pts[idx]                                    # [N,k,3]
    w = jnp.isfinite(-neg).astype(pts.dtype)           # [N,k]
    cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(nbrs * w[..., None], axis=1) / cnt  # [N,3]
    dev = (nbrs - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", dev, dev)
    _, V = jnp.linalg.eigh(cov)
    return V[:, :, 0]
