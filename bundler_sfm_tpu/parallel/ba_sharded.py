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
                   "views_obs", "views_mask", "schur_win")


def plan_shard_windows(row_of, schur_win, window: int, group_pts: int,
                       n_rows: int, num_shards: int):
    """Partition a `plan_schur_windows` plan across shards: point-groups go
    round-robin over shards (group g -> shard g mod D at local group
    g div D), the wide-span tail round-robin after the groups.  Returns
    (shard_of_pt [P], local_idx [P], schur_win_local [D, nwin_s],
    rows_per_shard) — feed the first three to shard_problem and the
    mapping to build_cam_obs_table_sharded/unshard_with_map.

    This is how the covisibility-windowed Schur assembly (the
    sba CRS-vmask analogue, lib/sba-1.5/sba.h:70-78) reaches the
    distributed BA path: each shard owns whole groups, so its local
    windowed assembly is exactly the single-device one over its groups and
    the psum reduces the window blocks."""
    D = num_shards
    nwin = len(schur_win)
    nwin_s = -(-nwin // D)
    G = group_pts
    wide = n_rows - nwin * G
    wide_s = -(-wide // D) if wide else 0
    rows_per_shard = nwin_s * G + wide_s

    r = np.asarray(row_of, np.int64)
    grouped = r < nwin * G
    g = r // G
    shard_of_pt = np.where(grouped, g % D, (r - nwin * G) % D).astype(
        np.int32)
    local_idx = np.where(
        grouped, (g // D) * G + r % G,
        nwin_s * G + (r - nwin * G) // D).astype(np.int64)
    sw = np.zeros((D, nwin_s), np.int32)
    for s in range(D):
        starts = schur_win[s::D]
        sw[s, :len(starts)] = starts
    return shard_of_pt, local_idx, sw, rows_per_shard


def shard_problem(
    R0, cam0, pts0, obs_cam, obs_pt, obs_xy, num_shards: int,
    *, est_focal=True, est_distortion=True,
    cam_constrained=None, cam_constraints=None, cam_weights=None,
    pt_constrained=None, pt_constraints=None, pt_weight: float = 0.0,
    pad_cams: Optional[int] = None,
    max_views: Optional[int] = None, pad_obs_per_shard: Optional[int] = None,
    pad_pts_per_shard: Optional[int] = None, dtype=np.float64,
    shard_of_pt: Optional[np.ndarray] = None,
    local_idx: Optional[np.ndarray] = None,
    schur_win_local: Optional[np.ndarray] = None,
) -> BAProblem:
    """Partition points into shards; each shard carries its points'
    observations.  Default assignment is round-robin; pass
    shard_of_pt/local_idx (e.g. from plan_shard_windows) for an explicit
    layout, plus schur_win_local [D, nwin_s] to activate the windowed
    Schur assembly per shard.  Returns a BAProblem whose sharded leaves
    have a leading [num_shards] axis (cameras replicated, no leading
    axis)."""
    P_total = len(pts0)
    obs_cam = np.asarray(obs_cam)
    obs_pt = np.asarray(obs_pt)
    obs_xy = np.asarray(obs_xy)
    pts0 = np.asarray(pts0)
    if shard_of_pt is None:
        shard_of_pt = np.arange(P_total) % num_shards
        local_idx = np.arange(P_total) // num_shards

    pts_per = (int(local_idx.max()) + 1) if P_total else 1
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
        # Scatter the shard's points to their local rows (the explicit
        # layout may leave group-padding holes; round-robin fills 0..n-1).
        pts_l = np.zeros((pts_pad, 3))
        pts_l[local_idx[p_sel]] = pts0[p_sel]
        pc_l = pt_con_l = None
        if pt_constrained is not None:
            pc_l = np.zeros(pts_pad)
            pc_l[local_idx[p_sel]] = np.asarray(pt_constrained)[p_sel]
            pt_con_l = np.zeros((pts_pad, 3))
            pt_con_l[local_idx[p_sel]] = np.asarray(pt_constraints)[p_sel]
        subs.append(build_problem(
            R0, cam0, pts_l,
            obs_cam[sel], local_idx[obs_pt[sel]], obs_xy[sel],
            est_focal=est_focal, est_distortion=est_distortion,
            cam_constrained=cam_constrained, cam_constraints=cam_constraints,
            cam_weights=cw,
            pt_constrained=pc_l, pt_constraints=pt_con_l,
            pt_weight=pt_weight,
            pad_cams=pad_cams,
            pad_pts=pts_pad, max_views=max_views,
            schur_win=(schur_win_local[s]
                       if schur_win_local is not None else None),
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
                                    "solver", "cg_iters", "window",
                                    "group_pts"))
def run_ba_sharded(prob: BAProblem, mesh: Mesh, max_iters: int = 100,
                   fix_points: bool = False, tau: float = 1e-3,
                   eps1: float = 1e-10, eps2: float = 1e-12,
                   solver: str = "cholesky",
                   cg_iters: int = 100, window: int = 0,
                   group_pts: int = 0) -> BAResult:
    """LM with point-sharded Schur assembly.  `prob` from shard_problem.

    solver="cholesky" psums the dense S_off and factorizes it replicated
    (right for ≤ a few hundred cameras); solver="cg" never materializes
    S_off — matrix-free distributed PCG whose per-product communication is
    one [C,9] psum, the at-scale configuration (thousands of cameras).

    window/group_pts (with a plan_shard_windows-sharded problem) activate
    the covisibility-windowed Schur assembly per shard — each shard owns
    whole point-groups, so every one-hot expansion/reduction and the Schur
    contraction shrink from [*, C] to [*, window] locally before the
    psum."""
    in_specs = BAProblem(**{f: _spec_for(f) for f in BAProblem._fields})
    out_specs = BAResult(cam=P(), R=P(), pts=P(AXIS), cost=P(),
                         initial_cost=P(), iters=P(), mu=P())

    def solve(p: BAProblem) -> BAResult:
        local = _local_problem(p)
        cam, pts, cost, cost0, iters, mu, _ = _ba._lm_loop(
            local, max_iters, fix_points, tau, eps1, eps2, "l2", 25.0,
            solver, axis=AXIS, window=window, group_pts=group_pts)
        R = jax.vmap(rot_update)(local.R0, cam[:, 3:6])
        return BAResult(cam=cam.at[:, 3:6].set(0.0), R=R, pts=pts[None],
                        cost=cost, initial_cost=cost0, iters=iters, mu=mu)

    fn = shard_map(solve, mesh=mesh, in_specs=(in_specs,),
                   out_specs=out_specs)
    return fn(prob)


@functools.partial(jax.jit, static_argnames=(
    "mesh", "max_iters", "fix_points", "loss", "solver", "max_passes",
    "remove_outliers", "window", "group_pts"))
def run_ba_outlier_loop_sharded(
    prob: BAProblem, cam_obs: jnp.ndarray, cam_obs_mask: jnp.ndarray,
    mesh: Mesh, max_iters: int = 150, fix_points: bool = False,
    tau: float = 1e-3, eps1: float = 1e-10, eps2: float = 1e-12,
    loss: str = "l2", huber_param: float = 25.0, solver: str = "cholesky",
    outlier_factor: float = 2.4, min_thresh: float = 8.0,
    max_thresh: float = 16.0, min_outliers: int = 40, min_points: int = 8,
    max_passes: int = 8, remove_outliers: bool = True,
    window: int = 0, group_pts: int = 0,
) -> BAOutlierResult:
    """The fused RunSFM outlier loop over a point-sharded mesh — the
    production multi-chip BA path.  `prob` from shard_problem; `cam_obs`/
    `cam_obs_mask` are the SHARDED per-device [D, C, S_local] tables from
    build_cam_obs_table_sharded — each device gathers its local distances
    and one tiled all_gather per stats pass assembles the per-camera rows
    (no full-observation all_gather, no replicated global table).

    window/group_pts (with a plan_shard_windows layout) run the
    covisibility-windowed Schur assembly per shard."""
    in_specs = (BAProblem(**{f: _spec_for(f) for f in BAProblem._fields}),
                P(AXIS), P(AXIS))
    out_specs = BAOutlierResult(
        cam=P(), R=P(), pts=P(AXIS), obs_valid=P(AXIS), pt_removed=P(AXIS),
        passes=P(), iters=P(), n_outliers=P(), stats=P(), hist=P(),
        hist_edges=P(), avg_dist=P(), too_few=P(), cost=P(),
        initial_cost=P())

    def solve(p, co, com):
        local = _local_problem(p)
        res = _ba._outlier_loop_core(
            local, co[0], com[0], max_iters, fix_points, tau, eps1, eps2,
            loss, huber_param, solver, outlier_factor, min_thresh,
            max_thresh, min_outliers, min_points, max_passes,
            remove_outliers, axis=AXIS, window=window, group_pts=group_pts)
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
                                pad_slots: Optional[int] = None,
                                shard_of_pt: Optional[np.ndarray] = None,
                                local_idx: Optional[np.ndarray] = None,
                                ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-shard, shard-LOCAL per-camera obs tables [D, C, S_local] + masks:
    row ids are each shard's own slot layout (l·M + within), so the sharded
    stats pass gathers locally and all_gathers only the [C, S_local]
    per-camera rows — not the full distance array.  Pass the same
    shard_of_pt/local_idx used for shard_problem (default round-robin)."""
    obs_cam = np.asarray(obs_cam)
    obs_pt = np.asarray(obs_pt, dtype=np.int64)
    if shard_of_pt is None:
        shard_of = obs_pt % num_shards
        local_pt = obs_pt // num_shards
    else:
        shard_of = np.asarray(shard_of_pt)[obs_pt]
        local_pt = np.asarray(local_idx)[obs_pt]
    within = _ba._slot_within(obs_pt)
    lids = local_pt * max_views + within
    if pad_slots is None:
        S = 1
        for s in range(num_shards):
            cnt = np.bincount(obs_cam[shard_of == s], minlength=num_cams)
            S = max(S, int(cnt.max()) if cnt.size else 1)
    else:
        S = pad_slots
    table = np.zeros((num_shards, num_cams, S), dtype=np.int32)
    mask = np.zeros((num_shards, num_cams, S), dtype=bool)
    for s in range(num_shards):
        sel = shard_of == s
        oc, li = obs_cam[sel], lids[sel]
        counts = np.bincount(oc, minlength=num_cams)
        if counts.size and counts.max() > S:
            raise ValueError(f"shard {s}: camera has {counts.max()} obs "
                             f"> pad_slots={S}")
        order = np.argsort(oc, kind="stable")
        slot = np.concatenate([np.arange(c) for c in counts]) \
            if len(oc) else np.zeros(0, np.int64)
        table[s, oc[order], slot] = li[order]
        mask[s, oc[order], slot] = True
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


def unshard_with_map(x_sharded, shard_of_pt, local_idx) -> np.ndarray:
    """[D, Np, ...] shards under an explicit (shard, local-row) point map
    (plan_shard_windows) -> [P, ...] in input point order."""
    arr = np.asarray(x_sharded)
    return arr[np.asarray(shard_of_pt), np.asarray(local_idx)]
