"""Batched fixed-round RANSAC machinery.

The reference runs RANSAC as a sequential hypothesize-score loop per pair
(`lib/imagelib/fmatrix.c`, `src/Register.cpp:82-144`,
`find_projection_3x4_ransac`).  On TPU every hypothesis is generated and
scored at once: sampling is a top-k trick over random keys (distinct valid
indices per round, matching the reference's no-duplicate sampling), model
fits are vmapped linear algebra, and scoring is one [rounds, N] reduction.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def exact_matmuls(fn):
    """Trace `fn` with default_matmul_precision='highest'.

    On TPU, f32 `@`/einsum default to bf16 MXU passes — a ~4e-3 relative
    perturbation.  The geometry estimators fit models from normalized O(1)
    quantities and score against px thresholds, where that noise shifts
    inlier sets and model fits by whole pixels; their matmuls are tiny, so
    exactness is free.  (The descriptor matcher and SIFT convs keep their
    explicitly chosen faster precisions.)"""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped


def selection_matrix(samples: jnp.ndarray, n_pad: int,
                     dtype) -> jnp.ndarray:
    """[R, k] sample indices -> [R, N] 0/1 selection matrix.

    Contracting this against precomputed per-correspondence normal-equation
    contributions turns R per-sample RANSAC fits into ONE MXU matmul —
    no per-sample coordinate gathers (the gather + tiny-op chains were
    the dominant cost of the vmapped fits on TPU; see
    `fmatrix.estimate_fmatrix_ransac`)."""
    iota = jnp.arange(n_pad, dtype=samples.dtype)
    sel = jnp.zeros((samples.shape[0], n_pad), dtype)
    for k in range(samples.shape[1]):
        sel = sel + (samples[:, k, None] == iota[None, :]).astype(dtype)
    return sel


def sample_indices(key: jax.Array, num_rounds: int, sample_size: int,
                   n_valid: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """[num_rounds, sample_size] distinct indices drawn from [0, n_valid).

    Implemented as top-k over per-round uniform noise with invalid (padded)
    entries masked to -inf — each round gets `sample_size` distinct valid
    indices, uniformly at random, with static shapes.
    """
    noise = jax.random.uniform(key, (num_rounds, n_pad))
    idx = jax.lax.broadcasted_iota(jnp.int32, (num_rounds, n_pad), 1)
    noise = jnp.where(idx < n_valid, noise, -jnp.inf)
    _, top = jax.lax.top_k(noise, sample_size)
    return top.astype(jnp.int32)


@exact_matmuls
def run_ransac(
    key: jax.Array,
    fit_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    residual_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x1: jnp.ndarray,           # [N, d1] padded observations (side 1)
    x2: jnp.ndarray,           # [N, d2] padded observations (side 2)
    n_valid: jnp.ndarray,      # scalar int: live entries
    num_rounds: int,
    sample_size: int,
    threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Generic batched RANSAC.

    fit_fn(s1 [k,d1], s2 [k,d2]) -> model (any pytree-leaf array)
    residual_fn(model, x1, x2)   -> [N] residuals
    Returns (best_model, inlier_mask [N] bool, num_inliers).
    """
    n_pad = x1.shape[0]
    samples = sample_indices(key, num_rounds, sample_size, n_valid, n_pad)
    s1 = x1[samples]           # [R, k, d1]
    s2 = x2[samples]
    models = jax.vmap(fit_fn)(s1, s2)

    def score(model):
        return residual_fn(model, x1, x2)

    resid = jax.vmap(score)(models)       # [R, N]
    valid = jnp.arange(n_pad) < n_valid
    ok = jnp.isfinite(resid) & (resid < threshold) & valid[None, :]
    counts = jnp.sum(ok, axis=1)
    best = jnp.argmax(counts)
    best_model = jax.tree_util.tree_map(lambda m: m[best], models)
    inliers = ok[best]
    return best_model, inliers, counts[best]


def hartley_normalize(pts: jnp.ndarray, mask: jnp.ndarray):
    """Isotropic normalization used by the reference's estimators
    (`lib/imagelib/fmatrix.c estimate_fmatrix_linear`): subtract centroid,
    scale mean |p - c| to sqrt(2). Returns (pts_norm [N,2], T [3,3])."""
    w = mask.astype(pts.dtype)
    count = jnp.maximum(jnp.sum(w), 1.0)
    c = jnp.sum(pts * w[:, None], axis=0) / count
    d = jnp.sqrt(jnp.sum((pts - c) ** 2, axis=1) + 1e-300)
    mean_d = jnp.sum(d * w) / count
    scale = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-12)
    pn = (pts - c) * scale
    T = jnp.array([[scale, 0.0, -scale * c[0]],
                   [0.0, scale, -scale * c[1]],
                   [0.0, 0.0, 1.0]], dtype=pts.dtype)
    return pn, T
