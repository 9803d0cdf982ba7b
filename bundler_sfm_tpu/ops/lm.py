"""Small dense LM solvers: single-camera refinement.

Replaces `camera_refine` (`lib/sfm-driver/sfm.c:1006-1190`, minpack lmdif):
refine one camera's pose (+ optionally focal/distortion) against fixed 3D
points.  The reference adds penalty terms when focal is being adjusted —
a focal constraint (weight `global_constrain_focal_weight`) and a distortion
shrink (`sfm.c:1146` camera_refine_residual_params) — mirrored here.

Vmappable across candidate cameras (batch registration registers a whole
round of cameras at once — `FindCamerasWithNMatches` + the loop at
`src/BundleFast.cpp:300-336`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from bundler_sfm_tpu.ops.ba import F_SCALE, K_SCALE
from bundler_sfm_tpu.ops.linalg_small import cholesky_solve
from bundler_sfm_tpu.ops.projection import project_one
from bundler_sfm_tpu.ops.rotations import rot_update

CNP = 9


def _refine_core(
    cam0: jnp.ndarray,        # [9] (c, w=0, f, k1, k2)
    R0: jnp.ndarray,          # [3,3]
    points: jnp.ndarray,      # [N,3] fixed
    projs: jnp.ndarray,       # [N,2]
    mask: jnp.ndarray,        # [N] bool
    adjust_focal: bool = True,
    estimate_distortion: bool = False,
    focal_constraint: float = 0.0,     # target focal (0 = none)
    focal_weight: float = 0.0,
    distortion_weight: float = 1.0e2,  # m_distortion_weight default
    max_iters: int = 50,
    tau: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Traceable LM body; returns (cam [9] with w folded, R [3,3], cost)."""
    dtype = cam0.dtype
    pmask = jnp.ones((CNP,), dtype=dtype)
    if not adjust_focal:
        pmask = pmask.at[6].set(0.0)
    if not estimate_distortion:
        pmask = pmask.at[7:9].set(0.0)

    fw = jnp.asarray(focal_weight, dtype)
    fc = jnp.asarray(focal_constraint, dtype)
    dw = jnp.asarray(distortion_weight, dtype) if estimate_distortion else \
        jnp.asarray(0.0, dtype)

    def residuals(cam):
        def one(X, xy, m):
            return jnp.where(m, project_one(cam, R0, X) - xy, 0.0)
        r = jax.vmap(one)(points, projs, mask)
        # Penalty terms (camera_refine, sfm.c:1088-1160): focal prior and
        # distortion shrink, active only when focal is adjustable.
        pen = jnp.stack([
            jnp.sqrt(fw) * (cam[6] - fc),
            jnp.sqrt(dw) * cam[7],
            jnp.sqrt(dw) * cam[8],
        ])
        return jnp.concatenate([r.reshape(-1), pen])

    def cost_of(cam):
        r = residuals(cam)
        return 0.5 * jnp.sum(r * r)

    # LM in the scaled space q = s∘x like run_sfm's packed f·0.001 / k·5.0
    # params (sfm.c:634-635): balances the focal/distortion columns of JᵀJ
    # against the pose columns so mu·I damping can't freeze them (see
    # ops/ba.py F_SCALE/K_SCALE).
    inv_s = jnp.array([1, 1, 1, 1, 1, 1, 1 / F_SCALE, 1 / K_SCALE,
                       1 / K_SCALE], dtype=dtype)

    # Convergence thresholds must be reachable in the working dtype: the
    # fixed 1e-12/1e-14 bounds below them are unreachable in f32, so every
    # f32 refine burned all `max_iters` latency-bound while iterations
    # (probe_refine.py).  The relative-cost criterion is scale-free:
    # stop once an ACCEPTED step improves the cost by less than ~100 ulp.
    tiny = jnp.asarray(jnp.finfo(dtype).eps, dtype)

    def body(state):
        cam, mu, nu, cost, it, done = state
        J = jax.jacfwd(residuals)(cam) * (pmask * inv_s)[None, :]
        r = residuals(cam)
        g = J.T @ r
        H = J.T @ J
        H = H + jnp.diag(1.0 - pmask)                     # PD for frozen
        Haug = H + mu * jnp.eye(CNP, dtype=dtype)
        delta = -cholesky_solve(Haug, g) * pmask
        cam_new = cam + delta * inv_s                     # δx = δq / s
        new_cost = cost_of(cam_new)
        pred = 0.5 * jnp.dot(delta, mu * delta - g)
        rho = (cost - new_cost) / jnp.maximum(pred, 1e-300)
        accept = new_cost < cost
        cam = jnp.where(accept, cam_new, cam)
        cost_next = jnp.where(accept, new_cost, cost)
        mu = jnp.where(accept,
                       mu * jnp.maximum(1.0 / 3.0, 1.0 - (2 * rho - 1) ** 3),
                       mu * nu)
        nu = jnp.where(accept, 2.0, nu * 2.0)
        gnorm = jnp.max(jnp.abs(g))
        converged = accept & ((cost - new_cost) <= 1e2 * tiny * cost)
        done = converged | (gnorm < 1e-12) \
            | (jnp.linalg.norm(delta) < 1e-14) | (mu > 1e30)
        return cam, mu, nu, cost_next, it + 1, done

    def cond(state):
        _, _, _, _, it, done = state
        return (it < max_iters) & ~done

    J0 = jax.jacfwd(residuals)(cam0) * (pmask * inv_s)[None, :]
    mu0 = tau * jnp.maximum(jnp.max(jnp.diag(J0.T @ J0)), 1.0)
    state = (cam0, mu0, jnp.asarray(2.0, dtype), cost_of(cam0),
             jnp.int32(0), jnp.asarray(False))
    cam, mu, nu, cost, it, done = jax.lax.while_loop(cond, body, state)
    R = rot_update(R0, cam[3:6])
    return cam.at[3:6].set(0.0), R, cost


camera_refine = functools.partial(
    jax.jit, static_argnames=("adjust_focal", "estimate_distortion",
                              "max_iters"))(_refine_core)
camera_refine.__doc__ = _refine_core.__doc__


camera_refine_batch = jax.vmap(
    camera_refine,
    in_axes=(0, 0, 0, 0, 0, None, None, None, None, None, None, None))


@functools.partial(
    jax.jit,
    static_argnames=("adjust_focal", "estimate_distortion", "max_iters",
                     "trim_iters"))
def camera_refine_trim(
    cam0: jnp.ndarray,        # [9] (c, w=0, f, k1, k2)
    R0: jnp.ndarray,          # [3,3]
    points: jnp.ndarray,      # [N,3] fixed
    projs: jnp.ndarray,       # [N,2]
    mask0: jnp.ndarray,       # [N] bool — initial inlier set
    adjust_focal: bool = True,
    estimate_distortion: bool = False,
    focal_constraint: float = 0.0,
    focal_weight: float = 0.0,
    distortion_weight: float = 1.0e2,
    max_iters: int = 50,
    tau: float = 1e-3,
    num_stddev: float = 2.0,          # m_outlier_threshold
    thr_min: float = 8.0,             # MIN/MAX_PROJ_ERROR_THRESHOLD
    thr_max: float = 16.0,
    trim_iters: int = 20,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused `RefineCameraParameters` (src/Bundle.cpp:2535-2694): repeat
    {LM refine, drop observations with reprojection error above
    clamp(1.2·num_stddev·p95, thr_min, thr_max)} until the inlier set is
    stable — the whole refine-and-trim loop in ONE device program instead
    of one dispatch per trim round.  Returns (cam, R, final inlier mask).
    """
    dtype = cam0.dtype
    N = points.shape[0]

    def refine(cam, R, mask, adj):
        return _refine_core(cam, R, points, projs, mask, adj,
                            estimate_distortion, focal_constraint,
                            focal_weight, distortion_weight, max_iters, tau)

    # First pass with focal fixed (src/Bundle.cpp:2562).
    cam, R, _ = refine(cam0, R0, mask0, False)

    def body(state):
        cam, R, mask, it, done = state
        cam, R, _ = refine(cam, R, mask, adjust_focal)
        pred = jax.vmap(lambda X: project_one(cam, R, X))(points)
        errs = jnp.linalg.norm(pred - projs, axis=1)
        n = jnp.sum(mask)
        # p95 over the masked subset: np.partition(errs, k95)[k95] with
        # k95 = min(round(0.95 n), n-1), invalid lanes sorted to the end.
        srt = jnp.sort(jnp.where(mask, errs, jnp.inf))
        k95 = jnp.clip(jnp.round(0.95 * n).astype(jnp.int32), 0, n - 1)
        med = srt[jnp.maximum(k95, 0)]
        thr = jnp.clip(1.2 * num_stddev * med, thr_min, thr_max)
        keep = mask & (errs < thr)
        stable = jnp.all(keep == mask) | ~jnp.any(keep)
        return cam, R, keep, it + 1, stable

    def cond(state):
        _, _, mask, it, done = state
        return (it < trim_iters) & ~done & jnp.any(mask)

    state = (cam, R, mask0, jnp.int32(0),
             jnp.asarray(~jnp.any(mask0)))
    cam, R, mask, _, _ = jax.lax.while_loop(cond, body, state)
    return cam, R, mask


camera_refine_trim_batch = jax.vmap(
    camera_refine_trim,
    in_axes=(0, 0, 0, 0, 0, None, None, 0, 0, None, None, None, None,
             None, None))
