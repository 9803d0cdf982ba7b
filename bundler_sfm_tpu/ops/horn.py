"""2D rigid/similarity alignment (Horn's method) + RANSAC.

Role of `align_horn` (`lib/imagelib/horn.h`, used by `EstimateTransform`'s
MotionRigid model, `src/Register.cpp:122-126`, and scene alignment): the
closed-form least-squares similarity transform between 2D point sets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bundler_sfm_tpu.ops.ransac import exact_matmuls, run_ransac


def fit_similarity_2d(p1: jnp.ndarray, p2: jnp.ndarray,
                      mask: jnp.ndarray) -> jnp.ndarray:
    """Weighted 2D similarity p2 ≈ s·R·p1 + t as a 3x3 matrix (Horn)."""
    w = mask.astype(p1.dtype)
    count = jnp.maximum(jnp.sum(w), 1.0)
    mu1 = jnp.sum(p1 * w[:, None], axis=0) / count
    mu2 = jnp.sum(p2 * w[:, None], axis=0) / count
    q1 = (p1 - mu1) * w[:, None]
    q2 = (p2 - mu2) * w[:, None]
    # Complex-number form of 2D Horn: s·e^{iθ} = Σ q2·conj(q1) / Σ |q1|².
    num_re = jnp.sum(q2[:, 0] * q1[:, 0] + q2[:, 1] * q1[:, 1])
    num_im = jnp.sum(q2[:, 1] * q1[:, 0] - q2[:, 0] * q1[:, 1])
    den = jnp.maximum(jnp.sum(q1[:, 0] ** 2 + q1[:, 1] ** 2), 1e-300)
    a = num_re / den
    b = num_im / den
    t = mu2 - jnp.stack([a * mu1[0] - b * mu1[1], b * mu1[0] + a * mu1[1]])
    return jnp.array([[a, -b, t[0]], [b, a, t[1]], [0.0, 0.0, 1.0]],
                     dtype=p1.dtype)


def similarity_transfer_dist(M: jnp.ndarray, p1: jnp.ndarray,
                             p2: jnp.ndarray) -> jnp.ndarray:
    ph = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], axis=-1)
    q = ph @ M.T
    return jnp.sqrt(jnp.sum((q[..., :2] - p2) ** 2, axis=-1))


@functools.partial(jax.jit, static_argnames=("num_rounds",))
@exact_matmuls
def estimate_similarity_ransac(key, p1, p2, n_valid, threshold,
                               num_rounds: int = 256):
    """MotionRigid RANSAC (3-point samples, `src/Register.cpp:58-60`)."""
    def fit(s1, s2):
        return fit_similarity_2d(s1, s2, jnp.ones(s1.shape[0], dtype=bool))

    def resid(M, a1, a2):
        return similarity_transfer_dist(M, a1, a2)

    M, inl, cnt = run_ransac(key, fit, resid, p1, p2, n_valid,
                             num_rounds, 3, threshold)
    M2 = fit_similarity_2d(p1, p2, inl)
    return M2, inl, cnt
