"""Rotation utilities: Rodrigues exponential map, RQ decomposition.

`rodrigues` mirrors the reference's `rot_update` (`lib/sfm-driver/sfm.c:77-116`):
R_new = exp([w]x) · R0, the incremental-rotation parameterization used by every
LM run.  All functions are jit/vmap-friendly (no data-dependent branching).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mm3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact small matrix product a @ b via broadcast-multiply+sum.

    On TPU, `@` on f32 routes through the MXU in bf16 passes; for rotation
    algebra that is a ~4e-3 relative perturbation — enough to corrupt
    projections by O(1 px) at f~700.  The elementwise form stays on the VPU
    and is exact in the operand dtype (and trivially cheap at 3x3)."""
    return (a[..., :, :, None] * b[..., None, :, :]).sum(-2)


def mv3(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Exact small matrix-vector product a @ v (see mm3)."""
    return (a * v[..., None, :]).sum(-1)


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """[w]x cross-product matrix; w: [..., 3] -> [..., 3, 3]."""
    zero = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zero, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(w: jnp.ndarray) -> jnp.ndarray:
    """exp([w]x): axis-angle [..., 3] -> rotation matrix [..., 3, 3].

    Uses the sinc-form series near theta=0 so it is smooth and
    autodiff-safe at w=0 (needed: LM starts every run at w=0,
    `lib/sfm-driver/sfm.c:669-671`).
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta_sq + 1e-300)
    # sin(t)/t and (1-cos(t))/t^2 with stable small-angle forms.
    small = theta_sq < 1e-16
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq)
    wx = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), wx.shape)
    return eye + a[..., None, None] * wx + b[..., None, None] * mm3(wx, wx)


def rot_update(R0: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """R = exp([w]x) @ R0 (lib/sfm-driver/sfm.c:115)."""
    return mm3(rodrigues(w), R0)


def log_rotation(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse Rodrigues: rotation matrix [..., 3, 3] -> axis-angle [..., 3]."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    # theta/(2 sin theta), stable near 0. Near pi the formula degrades; the
    # pipeline only logs small inter-iteration rotations, so clamp there.
    scale = jnp.where(theta < 1e-7, 0.5 + theta * theta / 12.0,
                      theta / (2.0 * jnp.maximum(sin_t, 1e-12)))
    return v * scale[..., None]


def rq3(M: jnp.ndarray):
    """RQ decomposition of a 3x3 matrix: M = R_upper @ Q with Q orthonormal.

    Replaces LAPACK `dgerqf_driver` (used to split K·R out of a projection
    matrix, `src/Bundle.cpp:2924`).  Built from QR via the reversal trick so
    it batches/jits on TPU: if P is the row-reversal permutation, then
    M = R Q  <=>  (P M)ᵀ = Qᵀ Pᵀ · (P R P)ᵀ with (P R P)ᵀ lower→... concretely:
      A = flipud(M).T ; A = q r  ⇒  M = flipud(flip(r).T-ish) — standard identity.
    """
    from bundler_sfm_tpu.ops.linalg_small import qr3
    A = jnp.flip(M, axis=-2).swapaxes(-1, -2)
    q, r = qr3(A)   # unrolled MGS — XLA:TPU has no f64 QR (linalg_small)
    R_upper = jnp.flip(jnp.flip(r.swapaxes(-1, -2), axis=-1), axis=-2)
    Q = jnp.flip(q.swapaxes(-1, -2), axis=-2)
    return R_upper, Q


def fix_intrinsics_sign(K: jnp.ndarray, Q: jnp.ndarray):
    """Make diag(K) positive by flipping matching columns of K / rows of Q
    (preserves K@Q).  Mirrors `FixIntrinsics` usage in
    `src/Bundle.cpp:2926-2928`.

    Contract: det(K@Q) must be > 0 — then diag(K) > 0 implies det(Q) = +1.
    Callers decomposing a DLT projection matrix must sign-normalize it first
    (multiply P by sign(det P[:,:3]))."""
    sign = jnp.sign(jnp.diagonal(K, axis1=-2, axis2=-1))
    sign = jnp.where(sign == 0, 1.0, sign)
    K = K * sign[..., None, :]
    Q = Q * sign[..., :, None]
    return K, Q
