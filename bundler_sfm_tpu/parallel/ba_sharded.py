"""Distributed bundle adjustment — points/observations sharded over the mesh.

The layout from SURVEY.md §2.4: each device owns a shard of the points and
ALL of their observations (view-table locality), cameras are replicated.
Per iteration every device builds its local U/V/W blocks and partial Schur
system; `psum` over ICI reduces U, g_c, S and the cost; the dense camera
solve is replicated (identical on all devices); point back-substitution is
local.  This is exactly SBA's U/V/W/S algebra (`lib/sba-1.5/sba_levmar.c:
1191-1373`) with the point sums turned into collectives.

The LM loop itself is ops/ba.py `_lm_loop` parameterized by the mesh axis —
the single-device and distributed solvers are the SAME code path, so the
production pipeline switches between them with a config knob
(config.num_devices) rather than a separate implementation.

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
    BAOutlierResult, BAProblem, BAResult, CNP, PNP, build_problem,
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
    pt_constrained=None, pt_constraints=None, pt_weight: float = 0.0,
    pad_cams: Optional[int] = None,
    max_views: Optional[int] = None, pad_obs_per_shard: Optional[int] = None,
    pad_pts_per_shard: Optional[int] = None, dtype=np.float64,
) -> BAProblem:
    """Partition points round-robin into shards; each shard carries its
    points' observations.  Returns a BAProblem whose sharded leaves have a
    leading [num_shards] axis (cameras replicated, no leading axis)."""
    P_total = len(pts0)
    obs_cam = np.asarray(obs_cam)
    obs_pt = np.asarray(obs_pt)
    obs_xy = np.asarray(obs_xy)
    pts0 = np.asarray(pts0)
    shard_of_pt = np.arange(P_total) % num_shards
    local_idx = np.arange(P_total) // num_shards

    pts_per = int(np.ceil(P_total / num_shards)) if P_total else 1
    pts_pad = pad_pts_per_shard or pts_per
    if max_views is None:
        # All shards must share one M for the stacked slot layout.
        pc = np.bincount(obs_pt) if len(obs_pt) else np.zeros(0, int)
        max_views = max(1, int(pc.max()) if len(obs_pt) else 1)

    subs = []
    # Camera constraints appear once per shard in build_normal_blocks; scale
    # weights by 1/D so the psum reconstructs them exactly once.
    cw = np.asarray(cam_weights) / num_shards \
        if cam_weights is not None else None
    for s in range(num_shards):
        sel = shard_of_pt[obs_pt] == s
        p_sel = shard_of_pt == s
        subs.append(build_problem(
            R0, cam0, pts0[p_sel],
            obs_cam[sel], local_idx[obs_pt[sel]], obs_xy[sel],
            est_focal=est_focal, est_distortion=est_distortion,
            cam_constrained=cam_constrained, cam_constraints=cam_constraints,
            cam_weights=cw,
            pt_constrained=(np.asarray(pt_constrained)[p_sel]
                            if pt_constrained is not None else None),
            pt_constraints=(np.asarray(pt_constraints)[p_sel]
                            if pt_constraints is not None else None),
            pt_weight=pt_weight,
            pad_cams=pad_cams,
            pad_pts=pts_pad, max_views=max_views,
            dtype=dtype))

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


def _local_problem(p: BAProblem) -> BAProblem:
    """Inside shard_map every sharded leaf has its local block with the
    leading shard axis of size 1 — drop it."""
    return BAProblem(**{
        f: (getattr(p, f)[0]
            if f in _SHARDED_FIELDS and getattr(p, f) is not None
            else getattr(p, f))
        for f in BAProblem._fields})


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

    def solve(p: BAProblem) -> BAResult:
        local = _local_problem(p)
        cam, pts, cost, cost0, iters, mu, _ = _ba._lm_loop(
            local, max_iters, fix_points, tau, eps1, eps2, "l2", 25.0,
            solver, axis=AXIS)
        R = jax.vmap(rot_update)(local.R0, cam[:, 3:6])
        return BAResult(cam=cam.at[:, 3:6].set(0.0), R=R, pts=pts[None],
                        cost=cost, initial_cost=cost0, iters=iters, mu=mu)

    fn = shard_map(solve, mesh=mesh, in_specs=(in_specs,),
                   out_specs=out_specs)
    return fn(prob)


@functools.partial(jax.jit, static_argnames=(
    "mesh", "max_iters", "fix_points", "loss", "solver", "max_passes",
    "remove_outliers"))
def run_ba_outlier_loop_sharded(
    prob: BAProblem, cam_obs: jnp.ndarray, cam_obs_mask: jnp.ndarray,
    mesh: Mesh, max_iters: int = 150, fix_points: bool = False,
    tau: float = 1e-3, eps1: float = 1e-10, eps2: float = 1e-12,
    loss: str = "l2", huber_param: float = 25.0, solver: str = "cholesky",
    outlier_factor: float = 2.4, min_thresh: float = 8.0,
    max_thresh: float = 16.0, min_outliers: int = 40, min_points: int = 8,
    max_passes: int = 8, remove_outliers: bool = True,
) -> BAOutlierResult:
    """The fused RunSFM outlier loop over a point-sharded mesh — the
    production multi-chip BA path.  `prob` from shard_problem; `cam_obs`
    must index the all-gathered observation layout (global obs id =
    shard·O_pad + local index, see ops/ba.py build_cam_obs_table_sharded).
    """
    in_specs = (BAProblem(**{f: _spec_for(f) for f in BAProblem._fields}),
                P(), P())
    out_specs = BAOutlierResult(
        cam=P(), R=P(), pts=P(AXIS), obs_valid=P(AXIS), pt_removed=P(AXIS),
        passes=P(), iters=P(), n_outliers=P(), stats=P(), hist=P(),
        hist_edges=P(), avg_dist=P(), too_few=P(), cost=P(),
        initial_cost=P())

    def solve(p, co, com):
        local = _local_problem(p)
        res = _ba._outlier_loop_core(
            local, co, com, max_iters, fix_points, tau, eps1, eps2, loss,
            huber_param, solver, outlier_factor, min_thresh, max_thresh,
            min_outliers, min_points, max_passes, remove_outliers,
            axis=AXIS)
        return res._replace(pts=res.pts[None], obs_valid=res.obs_valid[None],
                            pt_removed=res.pt_removed[None])

    # check_vma off: the outlier while_loop carries stats buffers that are
    # value-replicated (built from all-gathered distances) but that the
    # varying-axis tracker cannot prove replicated across the pass select.
    fn = shard_map(solve, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return fn(prob, cam_obs, cam_obs_mask)


def build_cam_obs_table_sharded(obs_cam: np.ndarray, obs_pt: np.ndarray,
                                num_shards: int,
                                num_cams: int,
                                pad_pts_per_shard: int,
                                max_views: int,
                                pad_slots: Optional[int] = None
                                ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-camera obs table over the ALL-GATHERED slot layout the sharded
    outlier loop sees: observation o of point p (owned by shard s = p mod D
    at local point row l = p div D, k-th view of its point) has global id
    s·(Pp·M) + l·M + k — matching shard_problem's per-shard build_problem
    slot layout concatenated over shards."""
    obs_cam = np.asarray(obs_cam)
    obs_pt = np.asarray(obs_pt, dtype=np.int64)
    shard_of = obs_pt % num_shards
    local_pt = obs_pt // num_shards
    within = _ba._slot_within(obs_pt)
    gids = (shard_of * (pad_pts_per_shard * max_views)
            + local_pt * max_views + within)
    counts = np.bincount(obs_cam, minlength=num_cams)
    S = pad_slots or max(1, int(counts.max()))
    table = np.zeros((num_cams, S), dtype=np.int32)
    mask = np.zeros((num_cams, S), dtype=bool)
    order = np.argsort(obs_cam, kind="stable")
    slot = np.concatenate([np.arange(c) for c in counts]) \
        if len(obs_cam) else np.zeros(0, np.int64)
    table[obs_cam[order], slot] = gids[order]
    mask[obs_cam[order], slot] = True
    return table, mask


def unshard_points(pts_sharded: jnp.ndarray, num_points: int) -> np.ndarray:
    """[D, Pp, 3] round-robin shards -> [num_points, 3]."""
    D, Pp, _ = pts_sharded.shape
    out = np.zeros((num_points, 3))
    arr = np.asarray(pts_sharded)
    for s in range(D):
        idx = np.arange(s, num_points, D)
        out[idx] = arr[s, :len(idx)]
    return out


def unshard_flat(x_sharded: jnp.ndarray, n: int) -> np.ndarray:
    """[D, Np, ...] round-robin point shards -> [n, ...]."""
    D = x_sharded.shape[0]
    arr = np.asarray(x_sharded)
    out = np.zeros((n,) + arr.shape[2:], dtype=arr.dtype)
    for s in range(D):
        idx = np.arange(s, n, D)
        out[idx] = arr[s, :len(idx)]
    return out
