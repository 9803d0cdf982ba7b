"""Distributed bundle adjustment — points/observations sharded over the mesh.

The layout from SURVEY.md §2.4: each device owns a shard of the points and
ALL of their observations (view-table locality), cameras are replicated.
Per iteration every device builds its local U/V/W blocks and partial Schur
system; `psum` over ICI reduces U, g_c, S and the cost; the dense camera
solve is replicated (identical on all devices); point back-substitution is
local.  This is exactly SBA's U/V/W/S algebra (`lib/sba-1.5/sba_levmar.c:
1191-1373`) with the point sums turned into collectives.

Camera-level quantities that build_normal_blocks adds per-shard (camera
constraints) are pre-scaled by 1/num_shards on the host so the psum
reconstructs them exactly once.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from bundler_sfm_tpu.ops import ba as _ba
from bundler_sfm_tpu.ops.ba import (
    BAProblem, BAResult, CNP, PNP, assemble_schur_off, back_substitute,
    build_normal_blocks, build_problem, solve_schur,
)
from bundler_sfm_tpu.ops.rotations import rot_update

AXIS = "shard"

# BAProblem leaves that are sharded over points/observations (leading axis).
_SHARDED_FIELDS = ("pts0", "pt_constrained", "pt_constraints",
                   "obs_cam", "obs_pt", "obs_xy", "obs_valid",
                   "views_obs", "views_mask")


def shard_problem(
    R0, cam0, pts0, obs_cam, obs_pt, obs_xy, num_shards: int,
    *, est_focal=True, est_distortion=True,
    cam_constrained=None, cam_constraints=None, cam_weights=None,
    max_views: Optional[int] = None, pad_obs_per_shard: Optional[int] = None,
    pad_pts_per_shard: Optional[int] = None,
) -> BAProblem:
    """Partition points round-robin into shards; each shard carries its
    points' observations.  Returns a BAProblem whose sharded leaves have a
    leading [num_shards] axis (cameras replicated, no leading axis)."""
    P_total = len(pts0)
    obs_cam = np.asarray(obs_cam)
    obs_pt = np.asarray(obs_pt)
    obs_xy = np.asarray(obs_xy)
    shard_of_pt = np.arange(P_total) % num_shards
    local_idx = np.arange(P_total) // num_shards

    pts_per = int(np.ceil(P_total / num_shards))
    pts_pad = pad_pts_per_shard or pts_per
    counts = np.bincount(shard_of_pt[obs_pt], minlength=num_shards)
    obs_pad = pad_obs_per_shard or int(counts.max())

    subs = []
    # Camera constraints appear once per shard in build_normal_blocks; scale
    # weights by 1/D so the psum reconstructs them exactly once.
    cw = cam_weights / num_shards if cam_weights is not None else None
    for s in range(num_shards):
        sel = shard_of_pt[obs_pt] == s
        p_sel = shard_of_pt == s
        subs.append(build_problem(
            R0, cam0, pts0[p_sel],
            obs_cam[sel], local_idx[obs_pt[sel]], obs_xy[sel],
            est_focal=est_focal, est_distortion=est_distortion,
            cam_constrained=cam_constrained, cam_constraints=cam_constraints,
            cam_weights=cw,
            pad_pts=pts_pad, pad_obs=obs_pad, max_views=max_views))

    def stack_field(name):
        vals = [getattr(s, name) for s in subs]
        if vals[0] is None:
            return None
        if name in _SHARDED_FIELDS:
            return jnp.stack(vals)
        return vals[0]

    return BAProblem(**{f: stack_field(f) for f in BAProblem._fields})


def _spec_for(name):
    return P(AXIS) if name in _SHARDED_FIELDS else P()


def _schur_matvec_local(x, U_aug, Y, W, local):
    """Matrix-free (S·x) from shard-local blocks: the off-diagonal
    point-coupled term never materializes S.  Per shard:
      t_o = W_oᵀ x[cam(o)];  s_i = Σ_{o∈views(i)} t_o;
      c_j = Σ_{o:cam=j} Y_o s_{pt(o)};  S·x = U_aug·x − psum(c).
    Communication is one [C,9] psum per product — C·36 bytes instead of the
    C²·81·4-byte S_off reduction, and no replicated dense factorization."""
    t = jnp.einsum("oab,oa->ob", W, x[local.obs_cam])
    s = _ba._point_sum(t, local)
    u = jnp.einsum("oab,ob->oa", Y, s[local.obs_pt])
    c = jax.lax.psum(_ba._segsum_onehot(u, local.obs_cam, x.shape[0]), AXIS)
    return jnp.einsum("jab,jb->ja", U_aug, x) - c


def _solve_schur_cg_sharded(U_aug, Y, W, rhs, local, max_iters: int,
                            tol: float = 1e-8):
    """Distributed SCHUR_JACOBI-preconditioned CG on the reduced camera
    system (the >200-camera ITERATIVE_SCHUR configuration,
    src/BundleCeres.cpp:132-134,369-379, distributed): the preconditioner
    uses the true S diagonal blocks D_j = U_aug_j − Σ_i Y_ij W_ijᵀ (psum'd
    once), the iteration uses the matrix-free psum matvec."""
    C = U_aug.shape[0]
    ywt = jnp.einsum("oab,ocb->oac", Y, W)                   # [O,9,9]
    D = U_aug - jax.lax.psum(
        _ba._segsum_onehot(ywt, local.obs_cam, C), AXIS)
    Minv = jnp.linalg.inv(D + 1e-12 * jnp.eye(CNP, dtype=D.dtype))

    def matvec(x):
        return _schur_matvec_local(x, U_aug, Y, W, local)

    def precond(r):
        return jnp.einsum("jab,jb->ja", Minv, r)

    b2 = jnp.sum(rhs * rhs)
    x0 = jnp.zeros_like(rhs)
    z0 = precond(rhs)
    state = (x0, rhs, z0, z0, jnp.sum(rhs * z0), jnp.int32(0))

    def cond(st):
        x, r, z, p, rz, it = st
        return (it < max_iters) & (jnp.sum(r * r) > tol * tol * b2)

    def body(st):
        x, r, z, p, rz, it = st
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-300)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        p = z + (rz_new / jnp.maximum(rz, 1e-300)) * p
        return x, r, z, p, rz_new, it + 1

    x, _, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    return x


@functools.partial(jax.jit,
                   static_argnames=("mesh", "max_iters", "fix_points",
                                    "solver", "cg_iters"))
def run_ba_sharded(prob: BAProblem, mesh: Mesh, max_iters: int = 100,
                   fix_points: bool = False, tau: float = 1e-3,
                   eps1: float = 1e-10, eps2: float = 1e-12,
                   solver: str = "cholesky",
                   cg_iters: int = 100) -> BAResult:
    """LM with point-sharded Schur assembly.  `prob` from shard_problem.

    solver="cholesky" psums the dense S_off and factorizes it replicated
    (right for ≤ a few hundred cameras); solver="cg" never materializes
    S_off — matrix-free distributed PCG whose per-product communication is
    one [C,9] psum, the at-scale configuration (thousands of cameras)."""
    in_specs = BAProblem(**{f: _spec_for(f) for f in BAProblem._fields})
    out_specs = BAResult(cam=P(), R=P(), pts=P(AXIS), cost=P(),
                         initial_cost=P(), iters=P(), mu=P())
    dtype = prob.cam0.dtype
    eyec = jnp.eye(CNP, dtype=dtype)
    eyep = jnp.eye(PNP, dtype=dtype)

    def solve(p: BAProblem) -> BAResult:
        # Inside shard_map every sharded leaf has its local block with the
        # leading shard axis of size 1 — drop it.
        local = BAProblem(**{
            f: (getattr(p, f)[0]
                if f in _SHARDED_FIELDS and getattr(p, f) is not None
                else getattr(p, f))
            for f in BAProblem._fields})

        def blocks(cam, pts):
            U, V, W, g_c, g_p, cost = build_normal_blocks(
                cam, pts, local, fix_points)
            U = jax.lax.psum(U, AXIS)
            g_c = jax.lax.psum(g_c, AXIS)
            cost = jax.lax.psum(cost, AXIS)
            return U, V, W, g_c, g_p, cost

        def step(cam, pts, mu):
            U, V, W, g_c, g_p, cost = blocks(cam, pts)
            frozen = 1.0 - local.cam_mask
            U_aug = U + jax.vmap(jnp.diag)(frozen) + mu * eyec[None]
            V_aug = V + (mu + 1e-12) * eyep[None]
            Vinv = _ba._inv3(V_aug)
            Vo = Vinv[local.obs_pt]
            Y = (W[:, :, :, None] * Vo[:, None, :, :]).sum(2)
            C = U_aug.shape[0]
            if solver == "cg":
                # rhs_off = −Σ_obs Y_o g_p[pt(o)] per camera, psum'd.
                contrib = jnp.sum(Y * g_p[local.obs_pt][:, None, :], axis=2)
                rhs = g_c - jax.lax.psum(
                    _ba._segsum_onehot(contrib, local.obs_cam, C), AXIS)
                dcam = _solve_schur_cg_sharded(U_aug, Y, W, rhs, local,
                                               cg_iters) * local.cam_mask
            else:
                S_off, rhs_off = assemble_schur_off(Y, W, g_p, local, C)
                # The point-coupled parts sum across shards; U_aug/g_c are
                # already global (psum'd in blocks()).
                S_off = jax.lax.psum(S_off, AXIS)
                rhs = g_c + jax.lax.psum(rhs_off, AXIS)
                S = S_off.at[jnp.arange(C), jnp.arange(C)].add(U_aug)
                dcam = solve_schur(S, rhs) * local.cam_mask
            if fix_points:
                dpts = jnp.zeros_like(pts)
            else:
                dpts = back_substitute(Vinv, W, g_p, dcam, local)
            return dcam, dpts, g_c, g_p, cost

        def total_cost(cam, pts):
            return jax.lax.psum(_ba.compute_cost(cam, pts, local), AXIS)

        U0, V0, _, g_c0, g_p0, cost0 = blocks(local.cam0, local.pts0)
        maxdiag = jnp.maximum(jnp.max(jax.vmap(jnp.diag)(U0)),
                              jax.lax.pmax(jnp.max(jax.vmap(jnp.diag)(V0)),
                                           AXIS))
        mu0 = tau * jnp.maximum(maxdiag, 1.0)

        def cond(st):
            return (st[5] < max_iters) & ~st[6]

        inv_s = 1.0 / local.cam_scale

        def body(st):
            cam, pts, mu, nu, cost, it, done = st
            dcam, dpts, g_c, g_p, _ = step(cam, pts, mu)
            cam_new = cam + dcam * inv_s[None]   # δx = δq / s (q-space solve)
            pts_new = pts + dpts
            new_cost = total_cost(cam_new, pts_new)
            pred_local = 0.5 * jnp.sum(dpts * (mu * dpts + g_p))
            pred = 0.5 * jnp.sum(dcam * (mu * dcam + g_c)) + \
                jax.lax.psum(pred_local, AXIS)
            rho = (cost - new_cost) / jnp.maximum(pred, 1e-300)
            accept = new_cost < cost
            cam = jnp.where(accept, cam_new, cam)
            pts = jnp.where(accept, pts_new, pts)
            cost_next = jnp.where(accept, new_cost, cost)
            mu = jnp.where(accept,
                           mu * jnp.maximum(1.0 / 3.0,
                                            1.0 - (2 * rho - 1) ** 3),
                           mu * nu)
            nu = jnp.where(accept, 2.0, nu * 2.0)
            gmax = jnp.maximum(jnp.max(jnp.abs(g_c)),
                               jax.lax.pmax(jnp.max(jnp.abs(g_p)), AXIS))
            dnorm = jnp.sqrt(jnp.sum(dcam ** 2) +
                             jax.lax.psum(jnp.sum(dpts ** 2), AXIS))
            q = cam * local.cam_scale[None]
            pnorm = jnp.sqrt(jnp.sum(q ** 2) +
                             jax.lax.psum(jnp.sum(pts ** 2), AXIS))
            done = (gmax < eps1) | (dnorm < eps2 * (pnorm + eps2)) | \
                (mu > 1e30)
            return cam, pts, mu, nu, cost_next, it + 1, done

        st = (local.cam0, local.pts0, mu0, jnp.asarray(2.0, dtype), cost0,
              jnp.int32(0), jnp.asarray(False))
        cam, pts, mu, nu, cost, iters, _ = jax.lax.while_loop(cond, body, st)
        R = jax.vmap(rot_update)(local.R0, cam[:, 3:6])
        return BAResult(cam=cam.at[:, 3:6].set(0.0), R=R, pts=pts[None],
                        cost=cost, initial_cost=cost0, iters=iters, mu=mu)

    fn = shard_map(solve, mesh=mesh, in_specs=(in_specs,),
                   out_specs=out_specs)
    return fn(prob)


def unshard_points(pts_sharded: jnp.ndarray, num_points: int) -> np.ndarray:
    """[D, Pp, 3] round-robin shards -> [num_points, 3]."""
    D, Pp, _ = pts_sharded.shape
    out = np.zeros((num_points, 3))
    arr = np.asarray(pts_sharded)
    for s in range(D):
        idx = np.arange(s, num_points, D)
        out[idx] = arr[s, :len(idx)]
    return out
