"""Incremental reconstruction driver — the `BundleAdjustFast` state machine
(`src/BundleFast.cpp:37-526`), host Python orchestrating jitted TPU kernels.

Loop structure (call stack SURVEY.md §3.2):
  pick initial pair  (`BundlePickInitialPair`, src/Bundle.cpp:1578-1701)
  setup initial pair (`SetupInitialCameraPair`, src/Bundle.cpp:1704-1884)
  run_sfm            (`RunSFM_SBA` + outlier loop, src/Bundle.cpp:568-919)
  while images remain:
    find candidates  (`FindCameraWithMostMatches` / `FindCamerasWithNMatches`)
    register batch   (`BundleInitializeImage`, src/Bundle.cpp:2994-3270)
    triangulate      (`BundleAdjustAddAllNewPoints`, src/BundleAdd.cpp:193-427)
    run_sfm + prune  (`RemoveBadPointsAndCameras`, src/Bundle.cpp:4190-4261)
    dump round outputs

TPU mapping: resection RANSAC, camera refinement, N-view triangulation,
ray-angle gates and the bundle adjustment are all jitted/batched kernels;
the host keeps only the bookkeeping (which image joins when).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bundler_sfm_tpu.config import BundlerConfig
from bundler_sfm_tpu.io.bundlefile import BundleCamera, BundleFile, BundlePoint
from bundler_sfm_tpu.io.plyfile import write_points_ply
from bundler_sfm_tpu.io.bundlefile import write_bundle_file
from bundler_sfm_tpu.ops.ba import (CNP, build_cam_obs_table,
                                    build_problem,
                                    run_ba_outlier_loop)
from bundler_sfm_tpu.ops.essential import pose_to_center
from bundler_sfm_tpu.ops.lm import (camera_refine, camera_refine_trim,
                                    camera_refine_trim_batch)
from bundler_sfm_tpu.ops.projection import ray_directions
from bundler_sfm_tpu.ops.resection import find_and_verify_camera
from bundler_sfm_tpu.ops.triangulate import (
    triangulate_tracks_pixels, triangulate_two_view,
)
from bundler_sfm_tpu.pipeline.scene import CameraPose, Scene
from bundler_sfm_tpu.pipeline.tracks import matches_from_tracks
from bundler_sfm_tpu.utils import counter, stage

INIT_REPROJECTION_ERROR = 16.0   # src/BundleAdd.cpp:43
ADD_REPROJECTION_ERROR = 16.0    # src/BundleAdd.cpp:44
INITIAL_DEPTH = 3.0              # src/Bundle.cpp:1776


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _bucket(n, lo=64):
    """Power-of-two-ish padding to bound recompilation."""
    b = lo
    while b < n:
        b *= 2
    return b


def _dt(cfg):
    """Pipeline compute dtype: float64 for C-parity on CPU, float32 to run
    the whole reconstruction on the TPU chip (config.ba_dtype)."""
    return np.float32 if cfg.ba_dtype == "float32" else np.float64


def resolve_num_devices(cfg: BundlerConfig) -> int:
    """config.num_devices with 0 = every visible device."""
    if cfg.num_devices == 0:
        return len(jax.devices())
    return max(1, cfg.num_devices)


@dataclasses.dataclass
class Reconstruction:
    """Mutable reconstruction state (the arrays BundleAdjustFast carries)."""
    added_order: List[int]                    # cam slot -> image idx
    cam_R: List[np.ndarray]                   # per slot [3,3]
    cam_params: List[np.ndarray]              # per slot [9] (c,0,f,k1,k2)
    points: List[np.ndarray]                  # [3] each
    colors: List[np.ndarray]
    pt_views: List[List[Tuple[int, int]]]     # (cam_slot, key_idx)
    track_extra: np.ndarray                   # [T] -> point idx / -1
    key_extra: List[Dict[int, int]]           # img -> {key: pt | -1 | -2}

    @property
    def num_cameras(self):
        return len(self.added_order)

    @property
    def num_points(self):
        return len(self.points)

    def slot_of_image(self, img: int) -> Optional[int]:
        try:
            return self.added_order.index(img)
        except ValueError:
            return None


def log(msg: str):
    print(msg, flush=True)


# --------------------------------------------------------------------------
# Initial pair
# --------------------------------------------------------------------------

def pick_initial_pair(scene: Scene, use_init_focal_only: bool
                      ) -> Tuple[int, int]:
    """`BundlePickInitialPair` (src/Bundle.cpp:1578-1701): most track-matches
    among pairs whose homography fits badly (score = 1/inlier_ratio > 2)."""
    cfg = scene.config
    if cfg.initial_pair[0] >= 0 and cfg.initial_pair[1] >= 0:
        return cfg.initial_pair
    n = scene.num_images
    SCORE_THRESHOLD = 2.0
    MATCH_THRESHOLD, MIN_SCORE, MIN_MATCHES = 32, 1.0e-1, 80
    best = (-1, -1, 0, 0.0)      # i, j, matches, score
    best2 = (-1, -1, 0, 0.0)
    # Pairwise shared-track counts as ONE sparse incidence self-product
    # (V[i, t] = 1 iff track t visible in image i): the per-pair
    # set-intersection loop was O(N^2 * tracks-per-image) on the host —
    # 17.4 s of the 256-image race (round-4 stage map).
    from scipy import sparse
    eligible = np.ones(n, bool)
    for i in range(n):
        if scene.ignore_in_bundle[i]:
            eligible[i] = False
        elif use_init_focal_only and cfg.use_focal_estimate \
                and not scene.has_init_focal(i):
            eligible[i] = False
    rows = np.concatenate([
        np.full(len(scene.visible_points[i]), i, np.int64)
        for i in range(n)]) if n else np.zeros(0, np.int64)
    cols = np.concatenate([
        np.asarray(scene.visible_points[i], np.int64)
        for i in range(n)]) if n else np.zeros(0, np.int64)
    T = int(cols.max()) + 1 if len(cols) else 1
    V = sparse.csr_matrix(
        (np.ones(len(rows), np.int32), (rows, cols)), shape=(n, T))
    counts = (V @ V.T).toarray()
    counts[~eligible] = 0
    counts[:, ~eligible] = 0
    ii, jj = np.nonzero(np.triu(counts, 1) > MATCH_THRESHOLD)
    for i, j in zip(ii.tolist(), jj.tolist()):
        num_matches = int(counts[i, j])
        ti = scene.transforms.get((i, j))
        ratio = ti.inlier_ratio if ti else 0.0
        score = MIN_SCORE if ratio == 0.0 else 1.0 / ratio
        if num_matches > best[2] and score > SCORE_THRESHOLD:
            best = (i, j, num_matches, score)
        if num_matches > MIN_MATCHES and score > best2[3]:
            best2 = (i, j, num_matches, score)
    if best[0] != -1:
        return best[0], best[1]
    if best2[0] != -1:
        return best2[0], best2[1]
    if use_init_focal_only:
        return pick_initial_pair(scene, False)
    return 0, 1


@jax.jit
def _triangulate_pairs_jit(p_all, q_all, f0, f1, R0, t1, R1, t2):
    """Batched two-view triangulation of the initial pair's matches.

    Jitted at module level: an un-jitted vmap here executed every primitive
    eagerly — hundreds of device round trips per reconstruction on the
    tunnel backend."""
    return jax.vmap(
        lambda pp, qq: triangulate_two_view(-pp / f0, -qq / f1,
                                            R0, t1, R1, t2))(p_all, q_all)


def setup_initial_pair(scene: Scene, i_best: int, j_best: int,
                       seed: int = 0) -> Reconstruction:
    """`SetupInitialCameraPair` (src/Bundle.cpp:1704-1884)."""
    cfg = scene.config
    f0 = scene.init_focal(i_best) if (not cfg.fixed_focal_length and
                                      scene.has_init_focal(i_best)) \
        else cfg.init_focal_length
    f1 = scene.init_focal(j_best) if (not cfg.fixed_focal_length and
                                      scene.has_init_focal(j_best)) \
        else cfg.init_focal_length

    R0 = np.eye(3)
    c0 = np.zeros(3)
    R1 = np.eye(3)
    c1 = np.zeros(3)

    pair_matches = matches_from_tracks(scene.tracks, i_best, j_best)
    x1 = scene.key_xy[i_best][pair_matches[:, 0]]
    x2 = scene.key_xy[j_best][pair_matches[:, 1]]

    solved = False
    if cfg.factor_essential and scene.has_init_focal(i_best) and \
            scene.has_init_focal(j_best) and not cfg.use_constraints:
        # 5-point RANSAC at 512 rounds, threshold 0.25·fmatrix_threshold —
        # exactly EstimateRelativePose2 (src/RelativePose.cpp:216-223).
        from bundler_sfm_tpu.ops.fivepoint import estimate_pose_5point
        n = len(pair_matches)
        pad = _bucket(n, 64)
        dt = _dt(cfg)
        x1p = np.zeros((pad, 2), dt); x1p[:n] = x1
        x2p = np.zeros((pad, 2), dt); x2p[:n] = x2
        with stage("init_5pt"):
            counter("dispatches")
            R, t, cnt, ok = estimate_pose_5point(
                jax.random.PRNGKey(seed + 101), jnp.asarray(x1p),
                jnp.asarray(x2p), jnp.int32(n), f0, f1,
                jnp.asarray(0.25 * cfg.fmatrix_threshold, dt),
                num_rounds=cfg.fivepoint_rounds)
        if bool(ok):
            R1 = np.asarray(R)
            c1 = np.asarray(pose_to_center(R, t))
            solved = True
            log(f"[SetupInitialCameraPair] 5pt-init: {int(cnt)}/{n} inliers")

    recon = Reconstruction(
        added_order=[i_best, j_best],
        cam_R=[R0, R1],
        cam_params=[
            np.concatenate([c0, np.zeros(3), [f0], np.zeros(2)]),
            np.concatenate([c1, np.zeros(3), [f1], np.zeros(2)]),
        ],
        points=[], colors=[], pt_views=[],
        track_extra=np.full(len(scene.tracks), -1, dtype=np.int64),
        key_extra=[dict() for _ in range(scene.num_images)],
    )

    # Triangulate the initial matches (src/Bundle.cpp:1806-1877) — one
    # vmapped call over all matches instead of a per-match dispatch loop.
    dt = _dt(cfg)
    n_m = len(pair_matches)
    if solved and n_m:
        # Pad to the same bucket as the 5-point call so the initial pair
        # reuses one compiled shape across datasets (every new shape costs
        # a full remote compile on the tunnel backend).
        padm = _bucket(n_m, 64)
        p_all = np.zeros((padm, 2), dt)
        q_all = np.zeros((padm, 2), dt)
        p_all[:n_m] = scene.key_xy[i_best][pair_matches[:, 0]]
        q_all[:n_m] = scene.key_xy[j_best][pair_matches[:, 1]]
        q_all[n_m:] = 1.0   # keep padded rays well-conditioned
        t1 = (-R0 @ c0).astype(dt)
        t2 = (-R1 @ c1).astype(dt)
        with stage("init_triangulate"):
            counter("dispatches")
            Xs, errs = _triangulate_pairs_jit(
                jnp.asarray(p_all), jnp.asarray(q_all),
                jnp.asarray(f0, dt), jnp.asarray(f1, dt),
                jnp.asarray(R0, dt), jnp.asarray(t1),
                jnp.asarray(R1, dt), jnp.asarray(t2))
        Xs = np.asarray(Xs)[:n_m]
        # Reference error gate: projection_estimation_threshold on the PIXEL
        # error; err here is normalized rms -> scale by mean focal.
        errs = np.asarray(errs)[:n_m] * 0.5 * (f0 + f1)
    for mi, (k1, k2) in enumerate(pair_matches):
        p = scene.key_xy[i_best][k1]
        if not solved:
            x_pt = (p[0] / cfg.init_focal_length) * INITIAL_DEPTH
            y_pt = (p[1] / cfg.init_focal_length) * INITIAL_DEPTH
            X = np.array([x_pt, y_pt, INITIAL_DEPTH + c0[2]])
        else:
            if errs[mi] > cfg.projection_estimation_threshold:
                continue
            X = Xs[mi]
        pt_idx = len(recon.points)
        recon.points.append(X)
        recon.colors.append(scene.color_of_key(i_best, int(k1)))
        recon.key_extra[i_best][int(k1)] = pt_idx
        recon.key_extra[j_best][int(k2)] = pt_idx
        tr = scene.key_track[i_best].get(int(k1))
        if tr is not None:
            recon.track_extra[tr] = pt_idx
        recon.pt_views.append([(0, int(k1)), (1, int(k2))])
    log(f"[SetupInitialCameraPair] {len(recon.points)} initial points")
    return recon


# --------------------------------------------------------------------------
# Bundle adjustment wrapper with outlier loop
# --------------------------------------------------------------------------

def _gather_problem(recon: Reconstruction, scene: Scene,
                    cfg: BundlerConfig):
    """vmask/projections marshaling (src/Bundle.cpp:597-637): only points
    with live views enter BA; remap maps recon idx -> BA idx.

    Vectorized: at 64+ images a Python per-observation loop costs seconds
    PER outer BA round on the host (measured 3.2s at 240k obs) — flatten
    through fromiter + grouped per-image fancy indexing instead."""
    import itertools
    C = recon.num_cameras
    counts = np.fromiter(map(len, recon.pt_views), dtype=np.int64,
                         count=len(recon.pt_views))
    live_mask = counts > 0
    live = np.nonzero(live_mask)[0]
    remap = {int(p): k for k, p in enumerate(live)}
    total = int(counts[live].sum())
    flat = np.fromiter(
        itertools.chain.from_iterable(
            itertools.chain.from_iterable(recon.pt_views[p] for p in live)),
        dtype=np.int64, count=2 * total).reshape(-1, 2)
    obs_cam = flat[:, 0].astype(np.int32)
    keys = flat[:, 1]
    obs_pt = np.repeat(np.arange(len(live), dtype=np.int32),
                       counts[live]).astype(np.int32)
    # Per-image grouped gather of the observed key coordinates.
    img_of_obs = np.asarray(recon.added_order, dtype=np.int64)[obs_cam]
    obs_xy = np.empty((total, 2), dtype=_dt(cfg))
    for img in np.unique(img_of_obs):
        sel = img_of_obs == img
        obs_xy[sel] = scene.key_xy[img][keys[sel]]
    return [int(p) for p in live], remap, (obs_cam, obs_pt, obs_xy)


def _cap_slot_views(obs_cam, obs_pt, obs_xy, num_points,
                    waste_factor: float = 4.0, min_cap: int = 32):
    """Bound the slot-layout view dimension M (ops/ba.py build_problem).

    The slot layout sizes every per-observation array as Pp*M with M the
    LONGEST live track, so one landmark visible in most cameras inflates
    O_pad = Pp*M far beyond the true observation count (a 256-view track
    over 262k padded points is 67M slots, ~7 GB for W alone in f32).  When
    the padding waste exceeds `waste_factor`, cap M at the smallest value
    that keeps Pp*M <= waste_factor*O (never below `min_cap`) and evenly
    subsample the views of the few points above the cap for this BA round.
    A capped point stays over-determined (>= 32 views), its dropped views
    remain in the track and return in later rounds; removal bookkeeping is
    per-point, so it is unaffected.  No-op for every test/golden-scale
    problem (waste < 4x or M <= 32)."""
    counts = np.bincount(obs_pt, minlength=num_points)
    M = int(counts.max()) if len(obs_pt) else 1
    O = len(obs_pt)
    if M <= min_cap or num_points * M <= waste_factor * O:
        return obs_cam, obs_pt, obs_xy
    cap = max(min_cap, int(np.ceil(waste_factor * O / num_points)))
    cap = _round_up(min(cap, M), 4)
    if cap >= M:
        return obs_cam, obs_pt, obs_xy
    from bundler_sfm_tpu.ops.ba import _slot_within
    within = _slot_within(obs_pt)
    cnt = counts[obs_pt]
    # Even decimation: keep view k of an n-view point iff the integer ramp
    # floor(k*cap/n) advances — exactly cap survivors, evenly spaced.
    keep = (cnt <= cap) | (((within + 1) * cap) // cnt
                           > (within * cap) // cnt)
    from bundler_sfm_tpu.utils import get_telemetry
    get_telemetry().add("ba_views_capped", float(np.sum(~keep)))
    return obs_cam[keep], obs_pt[keep], obs_xy[keep]


def run_sfm(recon: Reconstruction, scene: Scene,
            remove_outliers: bool = True, fix_points: bool = False,
            verbose: bool = True,
            pt_constraints: Optional[Dict[int, np.ndarray]] = None,
            pt_weight: float = 0.0) -> float:
    """`RunSFM_SBA` with the >40-outlier re-bundle loop
    (src/Bundle.cpp:568-919).  `pt_constraints` maps recon point index ->
    anchor position (--point_constraint_file, src/BundleIO.cpp:1241-1290).

    The whole BA + per-camera-threshold + point-removal + re-bundle loop
    runs as ONE device program (ops/ba.py run_ba_outlier_loop) — the host
    marshals the problem once and applies the removal bookkeeping once,
    instead of re-gathering per pass.  The outer host `while` only re-enters
    if the device hit its pass cap with outliers still above the floor."""
    cfg = scene.config
    MIN_POINTS, MIN_OUTLIERS = cfg.sfm_min_points, cfg.sfm_min_outliers
    MAX_PASSES = 8
    avg_dist = 0.0
    while True:
        live, remap, (obs_cam, obs_pt, obs_xy) = _gather_problem(
            recon, scene, cfg)
        if len(live) < MIN_POINTS:
            log("[RunSFM] Too few points remaining, exiting!")
            return float("inf")
        obs_cam, obs_pt, obs_xy = _cap_slot_views(
            obs_cam, obs_pt, obs_xy, len(live))

        C = recon.num_cameras
        cam0 = np.stack(recon.cam_params)
        R0 = np.stack(recon.cam_R)
        pts0 = np.stack([recon.points[p] for p in live])

        # Focal/distortion constraints (SetCameraConstraints/
        # SetFocalConstraint, src/Bundle.cpp:921-988).  The Ceres backend
        # scales prior weights by each camera's visibility count and uses
        # 1e-4·distortion_weight on k1/k2 (src/BundleCeres.cpp:300-323).
        num_vis = np.bincount(obs_cam, minlength=C)
        cc = np.zeros((C, CNP)); ct = np.zeros((C, CNP)); cw = np.zeros((C, CNP))
        for s in range(C):
            img = recon.added_order[s]
            if cfg.constrain_focal and scene.has_init_focal(img):
                cc[s, 6] = 1.0
                ct[s, 6] = scene.init_focal(img)
                cw[s, 6] = (cfg.constrain_focal_weight * num_vis[s]
                            if cfg.use_ceres else cfg.constrain_focal_weight)
            if cfg.estimate_distortion:
                cc[s, 7:9] = 1.0
                cw[s, 7:9] = (1e-4 * cfg.distortion_weight * num_vis[s]
                              if cfg.use_ceres else cfg.distortion_weight)

        pc_arr = pc_con = None
        pw = 0.0
        if pt_constraints:
            pc_arr = np.zeros(len(live))
            pc_con = np.zeros((len(live), 3))
            for k, p in enumerate(live):
                anchor = pt_constraints.get(p)
                if anchor is not None:
                    pc_arr[k] = 1.0
                    pc_con[k] = anchor
            pw = pt_weight

        # Power-of-2 buckets: an incremental run re-enters here every
        # registration round with a slightly larger C/M — granularity-4
        # rounding compiled ~18 distinct BA program shapes per 64-image run,
        # and on the remote backend each distinct shape pays a per-process
        # first-execution load (BASELINE.md round-4 from-pixels analysis).
        # Powers of two cap the shape count at O(log C) for ≤2× padding;
        # the padded cameras/views are masked, so only FLOPs are wasted —
        # cheap next to the per-shape load through the tunnel.
        Cp = _bucket(C, 8)
        Mp = _bucket(int(np.bincount(obs_pt).max()), 8)
        # Per-camera stat-table slots, bucketed so camera-count growth
        # reuses compiled shapes.
        Sp = _bucket(int(num_vis.max()), 256)
        from bundler_sfm_tpu.utils import get_telemetry
        solver = "cholesky"
        loss = "l2"
        if cfg.use_ceres:
            solver = ("cholesky" if C <= cfg.ceres_dense_max_cameras
                      else "cg")
            loss = "huber"
        ba_kw = dict(
            max_iters=cfg.sfm_max_iters, fix_points=fix_points,
            tau=cfg.sfm_mu0_tau, eps1=cfg.sfm_eps1, eps2=cfg.sfm_eps2,
            loss=loss, huber_param=cfg.ceres_huber_param, solver=solver,
            outlier_factor=1.2 * cfg.outlier_num_stddev,
            min_thresh=cfg.min_proj_error_threshold,
            max_thresh=cfg.max_proj_error_threshold,
            min_outliers=MIN_OUTLIERS, min_points=MIN_POINTS,
            max_passes=MAX_PASSES, remove_outliers=remove_outliers)
        D = resolve_num_devices(cfg)
        if D > 1:
            # Production multi-chip path: points/observations sharded over
            # the mesh, cameras replicated — same fused loop under
            # shard_map (SURVEY.md §2.4 distributed-BA row).
            from bundler_sfm_tpu.ops.ba import plan_schur_windows
            from bundler_sfm_tpu.parallel.ba_sharded import (
                _SHARDED_FIELDS, build_cam_obs_table_sharded,
                plan_shard_windows, run_ba_outlier_loop_sharded,
                shard_problem, unshard_flat, unshard_points,
                unshard_with_map,
            )
            from bundler_sfm_tpu.parallel.mesh import (
                fetch, globalize, make_mesh,
            )
            from jax.sharding import PartitionSpec as PS
            mesh = make_mesh(D)
            # Covisibility windows on the distributed path: whole point-
            # groups go to shards (plan_shard_windows), so each shard runs
            # the windowed assembly locally and the psum reduces window
            # blocks — without this, photo-tourism-scale multi-chip rounds
            # pay full-C one-hot expansion traffic per iteration.
            planS = plan_schur_windows(obs_cam, obs_pt, len(live), Cp, Mp)
            if planS is not None:
                row_ofS, schur_winS, win_wS, win_gS, n_rowsS = planS
                shard_of, local_of, sw_local, rows_s = plan_shard_windows(
                    row_ofS, schur_winS, win_wS, win_gS, n_rowsS, D)
                Pp_s = _bucket(rows_s, 64)
                get_telemetry().add("ba_schur_windowed", 1.0)
            else:
                shard_of = local_of = sw_local = None
                win_wS, win_gS = 0, 0
                Pp_s = _bucket(-(-len(live) // D), 64)
            probS = shard_problem(
                R0, cam0, pts0, obs_cam, obs_pt, obs_xy, D,
                est_focal=not cfg.fixed_focal_length,
                est_distortion=cfg.estimate_distortion,
                cam_constrained=cc, cam_constraints=ct, cam_weights=cw,
                pt_constrained=pc_arr, pt_constraints=pc_con, pt_weight=pw,
                pad_cams=Cp, max_views=Mp,
                pad_pts_per_shard=Pp_s, dtype=_dt(cfg),
                shard_of_pt=shard_of, local_idx=local_of,
                schur_win_local=sw_local)
            # Shard-local per-camera stat tables, bucketed for shape reuse.
            sh_obs = (shard_of[obs_pt] if shard_of is not None
                      else obs_pt % D)
            Sp_s = _bucket(int(np.bincount(
                sh_obs.astype(np.int64) * Cp + obs_cam,
                minlength=D * Cp).max()), 256)
            cam_obs, cam_obs_mask = build_cam_obs_table_sharded(
                obs_cam, obs_pt, D, Cp, Pp_s, Mp, Sp_s,
                shard_of_pt=shard_of, local_idx=local_of)
            # Multi-process meshes need globally-laid-out inputs (every
            # process holds the same host copy and contributes its
            # addressable shards); single-process this is a plain transfer.
            from bundler_sfm_tpu.ops.ba import BAProblem as _BAP
            probS = _BAP(**{
                f: globalize(getattr(probS, f), mesh,
                             PS("shard") if f in _SHARDED_FIELDS else PS())
                for f in _BAP._fields})
            with stage("ba"):
                counter("dispatches")
                res = run_ba_outlier_loop_sharded(
                    probS, globalize(cam_obs, mesh, PS("shard")),
                    globalize(cam_obs_mask, mesh, PS("shard")),
                    mesh, window=win_wS, group_pts=win_gS, **ba_kw)
                get_telemetry().add("ba_observations",
                                    float(len(obs_cam)) * float(res.iters))
            if shard_of is not None:
                pts = unshard_with_map(fetch(res.pts, mesh), shard_of,
                                       local_of)
                removed_arr = unshard_with_map(fetch(res.pt_removed, mesh),
                                               shard_of, local_of)
            else:
                pts = unshard_points(fetch(res.pts, mesh), len(live))
                removed_arr = unshard_flat(fetch(res.pt_removed, mesh),
                                           len(live))
        else:
            # Covisibility-windowed Schur assembly at high camera counts:
            # the full-C block contraction is (Cp·9)²·3·P FLOPs per LM
            # iteration — the 256+-camera cliff (VERDICT r2).  The planner
            # reorders points into camera-window groups; dummy padding
            # rows between groups have no observations.
            from bundler_sfm_tpu.ops.ba import (
                plan_schur_windows, plan_view_buckets,
            )
            plan = plan_schur_windows(obs_cam, obs_pt, len(live), Cp, Mp)
            vbuckets = None
            if plan is not None:
                row_of, schur_win, win_w, win_g, n_rows = plan
                get_telemetry().add("ba_schur_windowed", 1.0)
            else:
                schur_win, win_w, win_g, n_rows = None, 0, 0, len(live)
                # View-count-bucketed slot layout at mixed track density
                # (exclusive with the window plan — both reorder points).
                # The plan is STICKY across registration rounds (cached on
                # the reconstruction) so consecutive rounds reuse one
                # compiled BA shape instead of paying a per-round
                # program load through the remote backend.
                vb = plan_view_buckets(
                    obs_pt, len(live),
                    prev=getattr(recon, "_vb_cache", None))
                if vb is not None:
                    row_of, vbuckets, n_rows = vb
                    recon._vb_cache = vbuckets
                    get_telemetry().add("ba_view_bucketed", 1.0)
                else:
                    row_of = None
            if plan is not None or vbuckets is not None:
                pts0_r = np.zeros((n_rows, 3))
                pts0_r[row_of] = pts0
                pts0 = pts0_r
                if pc_arr is not None:
                    pa = np.zeros(n_rows); pa[row_of] = pc_arr
                    pc2 = np.zeros((n_rows, 3)); pc2[row_of] = pc_con
                    pc_arr, pc_con = pa, pc2
                obs_pt = row_of[obs_pt].astype(np.int32)
            Pp = n_rows if vbuckets is not None else _bucket(n_rows, 256)
            prob = build_problem(
                R0, cam0, pts0, obs_cam, obs_pt, obs_xy,
                est_focal=not cfg.fixed_focal_length,
                est_distortion=cfg.estimate_distortion,
                cam_constrained=cc, cam_constraints=ct, cam_weights=cw,
                pt_constrained=pc_arr, pt_constraints=pc_con, pt_weight=pw,
                pad_cams=Cp,
                pad_pts=None if vbuckets is not None else Pp,
                max_views=None if vbuckets is not None else Mp,
                schur_win=schur_win, view_buckets=vbuckets, dtype=_dt(cfg))
            cam_obs, cam_obs_mask = build_cam_obs_table(
                obs_cam, obs_pt, Cp, Sp, Mp, view_buckets=vbuckets)
            # Huge rounds run the host-driven chunked loop so no single
            # device execution exceeds the backend's per-execution limit
            # (ops/ba.py _FUSED_WORK_BUDGET; the fused one-dispatch loop is
            # the normal case).
            from bundler_sfm_tpu.ops.ba import (
                _FUSED_WORK_BUDGET, run_ba_outlier_loop_chunked,
            )
            # The fused program runs up to MAX_PASSES LM runs in ONE device
            # execution; the first pass dominates (later passes start from
            # a converged model and use few iterations), so budget a 2x
            # pass allowance rather than max_passes x.
            O_pad = (sum(pb * mb for pb, mb in vbuckets)
                     if vbuckets is not None else Pp * Mp)
            est_work = float(Cp) * O_pad * cfg.sfm_max_iters * 2.0
            runner = (run_ba_outlier_loop if est_work <= _FUSED_WORK_BUDGET
                      else run_ba_outlier_loop_chunked)
            with stage("ba"):
                counter("dispatches")
                res = runner(
                    prob, jnp.asarray(cam_obs), jnp.asarray(cam_obs_mask),
                    window=win_w, group_pts=win_g, **ba_kw)
                get_telemetry().add("ba_observations",
                                    float(len(obs_cam)) * float(res.iters))
            pts = np.asarray(res.pts)
            removed_full = np.asarray(res.pt_removed)
            if plan is not None or vbuckets is not None:
                pts = pts[row_of]
                removed_arr = removed_full[row_of]
            else:
                removed_arr = removed_full[:len(live)]
        cam = np.asarray(res.cam)
        Rf = np.asarray(res.R)
        passes = int(res.passes)
        n_out = np.asarray(res.n_outliers)
        too_few = bool(res.too_few)
        avg_dist = float(res.avg_dist)

        for s in range(C):
            recon.cam_params[s] = cam[s]
            recon.cam_R[s] = Rf[s]
        for k, p in enumerate(live):
            recon.points[p] = pts[k]

        if verbose:
            stats = np.asarray(res.stats)
            hist = np.asarray(res.hist)
            edges2 = np.asarray(res.hist_edges)
            for pi in range(passes):
                for s in range(C):
                    n, mean, p80, thresh = stats[pi, s]
                    if n <= 0:
                        continue
                    log(f"[RunSFM] cam {s}: {int(n)} obs, mean "
                        f"{mean:.3f}, p80 {p80:.3f}, thresh {thresh:.3f}")
                    # 10-bin error histogram (src/Bundle.cpp:823-846).
                    pr_min, pr_max = edges2[pi, s]
                    step = (pr_max - pr_min) / 10.0
                    for b in range(10):
                        hi = pr_min + step * (b + 1)
                        log(f"   E[{hi - step:0.3e}--{hi:0.3e}]: "
                            f"{int(hist[pi, s, b])} "
                            f"[{hist[pi, s, b] / n:0.3f}]")
                if remove_outliers:
                    log(f"[RunSFM] Removing {int(n_out[pi])} outliers "
                        f"(pass {pi + 1})")
            log(f"[RunSFM] {passes} passes, {int(res.iters)} LM iters, "
                f"cost {float(res.initial_cost):.1f} -> "
                f"{float(res.cost):.1f}")

        if not remove_outliers:
            return avg_dist

        # Apply the removal bookkeeping once for all passes.
        removed = removed_arr
        for k in np.nonzero(removed)[0]:
            p = live[k]
            for (slot, key) in recon.pt_views[p]:
                img = recon.added_order[slot]
                recon.key_extra[img][key] = -2   # never re-added
            recon.pt_views[p] = []
            recon.colors[p] = np.array([0.0, 0.0, 255.0])

        if too_few:
            log("[RunSFM] Too few points remaining, exiting!")
            return float("inf")
        if passes < MAX_PASSES or int(n_out[passes - 1]) <= MIN_OUTLIERS:
            return avg_dist
        # Device hit the pass cap with outliers still flowing: re-gather
        # (dead points drop out) and run another fused batch of passes.


# --------------------------------------------------------------------------
# Camera registration
# --------------------------------------------------------------------------

def fix_necker_reversal(recon: Reconstruction, scene: Scene) -> None:
    """Necker-reversal handling after the initial two-camera bundle
    (--fix_necker; src/BundleFast.cpp:126-214, src/Bundle.cpp:2160-2240):
    swap the two cameras' poses, reset their focals to the initial guesses
    and distortion to zero, re-triangulate every point from the swapped
    pair, and re-bundle.  The reference commits to the flipped
    configuration unconditionally (the error0/error1 restore is compiled
    out, BundleFast.cpp:202-213)."""
    assert recon.num_cameras == 2
    cfg = scene.config
    i_best, j_best = recon.added_order
    f0 = scene.init_focal(i_best) if (not cfg.fixed_focal_length and
                                      scene.has_init_focal(i_best)) \
        else cfg.init_focal_length
    f1 = scene.init_focal(j_best) if (not cfg.fixed_focal_length and
                                      scene.has_init_focal(j_best)) \
        else cfg.init_focal_length

    # Swap poses; reset intrinsics (BundleFast.cpp:137-147).
    R0, R1 = recon.cam_R[1].copy(), recon.cam_R[0].copy()
    c0, c1 = recon.cam_params[1][0:3].copy(), recon.cam_params[0][0:3].copy()
    recon.cam_R[0], recon.cam_R[1] = R0, R1
    recon.cam_params[0] = np.concatenate([c0, np.zeros(3), [f0], np.zeros(2)])
    recon.cam_params[1] = np.concatenate([c1, np.zeros(3), [f1], np.zeros(2)])

    # Re-triangulate each live point from its two views (:158-196), batched
    # into one padded dispatch (both views are the two swapped cameras, so
    # the whole pass shares one (f, R, t) pair per side).
    dt = _dt(cfg)
    todo = [p for p in range(len(recon.points))
            if len(recon.pt_views[p]) >= 2]
    if todo:
        padn = _bucket(len(todo), 64)
        p_all = np.zeros((padn, 2), dt)
        q_all = np.zeros((padn, 2), dt)
        q_all[len(todo):] = 1.0
        for mi, p in enumerate(todo):
            (s1, k1), (s2, k2) = recon.pt_views[p][0], recon.pt_views[p][1]
            assert (s1, s2) == (0, 1)
            p_all[mi] = scene.key_xy[recon.added_order[s1]][k1]
            q_all[mi] = scene.key_xy[recon.added_order[s2]][k2]
        t1 = (-recon.cam_R[0] @ recon.cam_params[0][0:3]).astype(dt)
        t2 = (-recon.cam_R[1] @ recon.cam_params[1][0:3]).astype(dt)
        counter("dispatches")
        Xs, _ = _triangulate_pairs_jit(
            jnp.asarray(p_all), jnp.asarray(q_all),
            jnp.asarray(f0, dt), jnp.asarray(f1, dt),
            jnp.asarray(recon.cam_R[0], dt), jnp.asarray(t1),
            jnp.asarray(recon.cam_R[1], dt), jnp.asarray(t2))
        Xs = np.asarray(Xs)
        for mi, p in enumerate(todo):
            recon.points[p] = Xs[mi].astype(np.float64)

    log("[FixNecker] Re-bundling the reversed configuration")
    run_sfm(recon, scene)


def find_candidate_images(recon: Reconstruction, scene: Scene
                          ) -> Dict[int, int]:
    """#existing 3D points seen by each unregistered image
    (`FindCameraWithMostMatches`/`FindCamerasWithNMatches`,
    src/Bundle.cpp:1437-1570)."""
    counts: Dict[int, int] = {}
    registered = set(recon.added_order)
    for i in range(scene.num_images):
        if i in registered or scene.ignore_in_bundle[i]:
            continue
        if scene.config.only_bundle_init_focal and not scene.has_init_focal(i):
            continue
        cnt = 0
        for tr in scene.visible_points[i]:
            pt = recon.track_extra[tr]
            if pt >= 0 and len(recon.pt_views[pt]) > 0:
                cnt += 1
        counts[i] = cnt
    return counts


def find_camera_with_most_connectivity(recon: Reconstruction, scene: Scene,
                                       frontier_min_matches: int = 32
                                       ) -> Tuple[int, int]:
    """Next-image selection that maximizes frontier growth
    (`FindCameraWithMostConnectivity`, src/Bundle.cpp:1209-1434, selected by
    --construct_max_connectivity): among unregistered images seeing enough
    existing points (>= max(32, 0.2*max_seen)), pick the one whose addition
    would put the most new images onto the frontier (>32 shared tracks);
    ties broken by points seen.  Returns (image, num_existing_matches) or
    (-1, 0)."""
    registered = set(recon.added_order)
    n = scene.num_images

    def shared_tracks(i, j):
        si = set(scene.visible_points[i])
        return sum(1 for t in scene.visible_points[j] if t in si)

    frontier = [False] * n
    for i in registered:
        frontier[i] = True
        for j in range(n):
            if j != i and not frontier[j] and \
                    shared_tracks(i, j) > frontier_min_matches:
                frontier[j] = True

    seen_scores = {}
    frontier_scores = {}
    for i in range(n):
        if i in registered or scene.ignore_in_bundle[i]:
            continue
        if scene.config.only_bundle_init_focal and not scene.has_init_focal(i):
            continue
        seen = set()
        for tr in scene.visible_points[i]:
            pt = recon.track_extra[tr]
            if pt >= 0 and len(recon.pt_views[pt]) > 0:
                seen.add(int(pt))
        seen_scores[i] = len(seen)
        frontier_scores[i] = sum(
            1 for j in range(n) if not frontier[j] and j != i
            and shared_tracks(i, j) > frontier_min_matches)

    if not seen_scores:
        return -1, 0
    max_seen = max(seen_scores.values())
    if max_seen == 0:
        return -1, 0
    i_best, top = -1, (-1, -1)
    for i, seen in seen_scores.items():
        if seen < 0.20 * max_seen or seen < 32:
            continue
        score = (frontier_scores[i], seen)
        if score > top:
            i_best, top = i, score
    if i_best == -1:
        return -1, 0
    return i_best, seen_scores[i_best]


def refine_camera_iterative(scene: Scene, img: int, cam0: np.ndarray,
                            R0: np.ndarray, pts: np.ndarray,
                            projs: np.ndarray, adjust_focal: bool
                            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """`RefineCameraParameters` (src/Bundle.cpp:2535-2694): repeat
    {camera_refine, drop obs with error > clamp(2.4·p95, 8, 16)} until the
    inlier set stabilizes.  Returns (cam, R, inlier_indices)."""
    cfg = scene.config
    pad = _bucket(len(pts), 64)
    dt = _dt(cfg)

    n = len(pts)
    P = np.zeros((pad, 3), dt); P[:n] = pts
    X = np.zeros((pad, 2), dt); X[:n] = projs
    m = np.zeros(pad, dtype=bool); m[:n] = True
    fw = cfg.constrain_focal_weight if (cfg.constrain_focal and
                                        scene.has_init_focal(img)) else 0.0
    fc = scene.init_focal(img) if fw > 0 else 0.0
    counter("dispatches")
    cam, R, mask = camera_refine_trim(
        jnp.asarray(cam0, dt), jnp.asarray(R0, dt), jnp.asarray(P),
        jnp.asarray(X), jnp.asarray(m), adjust_focal,
        cfg.estimate_distortion, fc, fw, cfg.distortion_weight, 50, 1e-3,
        cfg.outlier_num_stddev, cfg.min_proj_error_threshold,
        cfg.max_proj_error_threshold)
    idxs = np.nonzero(np.asarray(mask)[:n])[0]
    return np.asarray(cam), np.asarray(R), idxs


def _resect_one_chunk(rkeys, X, x, nv, thr, weak_thr, num_rounds):
    return jax.vmap(
        lambda k, Xi, xi, ni: find_and_verify_camera(
            k, Xi, xi, ni, thr, weak_thr, num_rounds=num_rounds)
    )(rkeys, X, x, nv)


def _resect_batch(rkeys, X, x, nv, thr, weak_thr, num_rounds):
    """Vmapped resection RANSAC, chunked over candidates: each lane peaks
    at a [num_rounds, pad] distance table, so one 192-candidate round at
    256-image scale needs ~22 GB in one program (measured HBM OOM) —
    bound lanes-per-dispatch so the peak stays ~2 GB."""
    B, pad = X.shape[0], X.shape[1]
    ch = max(4, min(B, (1 << 29) // max(num_rounds * pad, 1)))
    ch = ((ch + 3) // 4) * 4
    if ch >= B:
        return _resect_one_chunk(rkeys, X, x, nv, thr, weak_thr, num_rounds)
    outs = []
    for s in range(0, B, ch):
        e = min(s + ch, B)
        idx = np.arange(s, e)
        if e - s < ch:                 # pad to the compiled chunk shape
            idx = np.concatenate([idx, np.full(ch - (e - s), s)])
        outs.append(_resect_one_chunk(
            rkeys[idx], X[idx], x[idx], nv[idx], thr, weak_thr, num_rounds))
    cat = [jnp.concatenate(parts, axis=0)[:B] for parts in zip(*outs)]
    return type(outs[0])(*cat)



def bundle_initialize_images(recon: Reconstruction, scene: Scene,
                             imgs: Sequence[int], seed: int) -> List[int]:
    """Batched `BundleInitializeImage` over one registration round.

    The reference registers candidates one at a time
    (src/BundleFast.cpp:300-336); here the whole round runs as ONE vmapped
    resection RANSAC plus a lockstep masked refine-and-trim loop — a handful
    of device dispatches for the batch instead of dozens per image.  Gating
    and trim rules match bundle_initialize_image exactly.  Returns the list
    of image ids that registered (cameras appended to `recon` in that
    order); failures are the caller's to mark ignored.
    """
    cfg = scene.config
    dt = _dt(cfg)
    cands = []
    for img in imgs:
        pts3, projs, pt_idx, keys = [], [], [], []
        for tr, key in zip(scene.visible_points[img],
                           scene.visible_keys[img]):
            pt = recon.track_extra[tr]
            if pt < 0 or len(recon.pt_views[pt]) == 0:
                continue
            pts3.append(recon.points[pt])
            projs.append(scene.key_xy[img][key])
            pt_idx.append(pt)
            keys.append(key)
        if len(pts3) < cfg.min_max_matches:
            log(f"[BundleInitializeImage] {img}: too few matches")
            continue
        cands.append(dict(img=img, pts3=np.stack(pts3),
                          projs=np.stack(projs), pt_idx=pt_idx, keys=keys))
    if not cands:
        return []

    B = len(cands)
    # Power-of-2 shape buckets (candidate count varies every round).  NOTE
    # round-5 tried wide minimums (lanes>=16, pad>=512) to cut shape
    # variety; the bigger programs made remote-side reloads 4x slower and
    # the resection stage REGRESSED 19 -> 78 s on an unlucky run — the
    # 31-63 ms kernels (probe_register.py) are noise either way, so keep
    # the smaller programs.
    Bp = _bucket(B, 4)
    pad = _bucket(max(len(c["pts3"]) for c in cands), 64)
    Xp = np.zeros((Bp, pad, 3), dt)
    xp = np.zeros((Bp, pad, 2), dt)
    nv = np.zeros(Bp, np.int32)
    for b, c in enumerate(cands):
        n = len(c["pts3"])
        Xp[b, :n] = c["pts3"]
        xp[b, :n] = c["projs"]
        nv[b] = n
    nv[B:] = 6  # keep padded lanes solvable
    Xp[B:, :6] = Xp[0, :6] if B else 0.0
    xp[B:, :6] = xp[0, :6] if B else 0.0

    rkeys = jax.random.split(jax.random.PRNGKey(seed), Bp)
    with stage("resection"):
        counter("dispatches")
        ver = _resect_batch(
            rkeys, jnp.asarray(Xp), jnp.asarray(xp), jnp.asarray(nv),
            jnp.asarray(cfg.projection_estimation_threshold, dt),
            jnp.asarray(16.0 * cfg.projection_estimation_threshold, dt),
            cfg.projection_rounds)
        ok = np.asarray(ver.ok)
        Ks = np.asarray(ver.K)
        Rs = np.asarray(ver.R)
        ts = np.asarray(ver.t)
        weak = np.asarray(ver.inliers_weak)

    # Per-image focal initialization (src/Bundle.cpp:3131-3172) + refine
    # state.  `live` indexes into cands.
    live = []
    cam0 = np.zeros((Bp, CNP), dt)
    R0 = np.tile(np.eye(3, dtype=dt), (Bp, 1, 1))
    masks = np.zeros((Bp, pad), bool)
    fcs = np.zeros(Bp, dt)
    fws = np.zeros(Bp, dt)
    for b, c in enumerate(cands):
        img = c["img"]
        if not ok[b]:
            log(f"[BundleInitializeImage] {img}: pose estimation failed")
            continue
        if not weak[b, :nv[b]].any():
            continue
        K, R, t = Ks[b], Rs[b], ts[b]
        if cfg.fixed_focal_length:
            f_new = cfg.init_focal_length
        elif cfg.use_focal_estimate and scene.has_init_focal(img):
            f_init = scene.init_focal(img)
            f_obs = 0.5 * (K[0, 0] + K[1, 1])
            ratio = f_init / f_obs if f_init > f_obs else f_obs / f_init
            f_new = f_init if (ratio < 1.4 or cfg.trust_focal_estimate) \
                else f_obs
        elif scene.has_init_focal(img) and cfg.use_focal_estimate:
            f_new = scene.init_focal(img)
        else:
            f_new = 0.5 * (K[0, 0] + K[1, 1])
        cam0[b, 0:3] = -R.T @ t
        cam0[b, 6] = f_new
        R0[b] = R
        masks[b] = weak[b]
        if cfg.constrain_focal and scene.has_init_focal(img):
            fcs[b] = scene.init_focal(img)
            fws[b] = cfg.constrain_focal_weight
        live.append(b)
    if not live:
        return []

    # The whole batched refine-and-trim loop (first pass focal-fixed, then
    # refine + p95 trim until stable — refine_camera_iterative's rule) runs
    # as ONE fused device program (ops/lm.py camera_refine_trim).
    adjust_focal = not cfg.fixed_focal_length
    with stage("refine_camera"):
        counter("dispatches")
        cam, R, masks_out = camera_refine_trim_batch(
            jnp.asarray(cam0), jnp.asarray(R0), jnp.asarray(Xp),
            jnp.asarray(xp), jnp.asarray(masks), adjust_focal,
            cfg.estimate_distortion, jnp.asarray(fcs), jnp.asarray(fws),
            cfg.distortion_weight, 50, 1e-3, cfg.outlier_num_stddev,
            cfg.min_proj_error_threshold, cfg.max_proj_error_threshold)
        cam = np.asarray(cam)
        R = np.asarray(R)
        masks = np.asarray(masks_out)

    registered = []
    for b in live:
        c = cands[b]
        img = c["img"]
        inl = np.nonzero(masks[b, :nv[b]])[0]
        width = scene.dims[img][0]
        if len(inl) < 8 or cam[b, 6] < 0.1 * width:
            log(f"[BundleInitializeImage] {img}: bad camera "
                f"({len(inl)} inliers, f={cam[b, 6]:.1f})")
            continue
        cam_slot = recon.num_cameras
        for i in inl:
            recon.key_extra[img][c["keys"][i]] = c["pt_idx"][i]
            recon.pt_views[c["pt_idx"][i]].append((cam_slot, c["keys"][i]))
        recon.added_order.append(img)
        recon.cam_R.append(R[b].astype(np.float64))
        recon.cam_params.append(cam[b].astype(np.float64))
        counter("images_registered")
        log(f"[BundleInitializeImage] {img}: registered with {len(inl)} "
            f"points, f={cam[b, 6]:.2f}")
        registered.append(img)
    return registered


def bundle_initialize_image(recon: Reconstruction, scene: Scene, img: int,
                            cam_slot: int, seed: int) -> bool:
    """`BundleInitializeImage` (src/Bundle.cpp:2994-3270)."""
    cfg = scene.config
    # Connect existing 3D points.
    pts3, projs, pt_idx, keys = [], [], [], []
    for tr, key in zip(scene.visible_points[img], scene.visible_keys[img]):
        pt = recon.track_extra[tr]
        if pt < 0 or len(recon.pt_views[pt]) == 0:
            continue
        pts3.append(recon.points[pt])
        projs.append(scene.key_xy[img][key])
        pt_idx.append(pt)
        keys.append(key)
    if len(pts3) < cfg.min_max_matches:
        log(f"[BundleInitializeImage] {img}: too few matches")
        return False
    pts3 = np.stack(pts3)
    projs = np.stack(projs)
    n = len(pts3)

    pad = _bucket(n, 64)
    dt = _dt(cfg)
    Xp = np.zeros((pad, 3), dt); Xp[:n] = pts3
    xp = np.zeros((pad, 2), dt); xp[:n] = projs
    with stage("resection"):
        counter("dispatches")
        ver = find_and_verify_camera(
            jax.random.PRNGKey(seed), jnp.asarray(Xp), jnp.asarray(xp),
            jnp.int32(n), jnp.asarray(cfg.projection_estimation_threshold, dt),
            jnp.asarray(16.0 * cfg.projection_estimation_threshold, dt),
            num_rounds=cfg.projection_rounds)
    if not bool(ver.ok):
        log(f"[BundleInitializeImage] {img}: pose estimation failed")
        return False
    K = np.asarray(ver.K)
    R = np.asarray(ver.R)
    t = np.asarray(ver.t)
    center = -R.T @ t

    # Focal initialization (src/Bundle.cpp:3131-3172).
    if cfg.fixed_focal_length:
        f_new = cfg.init_focal_length
    elif cfg.use_focal_estimate and scene.has_init_focal(img):
        f_init = scene.init_focal(img)
        f_obs = 0.5 * (K[0, 0] + K[1, 1])
        ratio = f_init / f_obs if f_init > f_obs else f_obs / f_init
        f_new = f_init if (ratio < 1.4 or cfg.trust_focal_estimate) else f_obs
    elif scene.has_init_focal(img) and cfg.use_focal_estimate:
        f_new = scene.init_focal(img)
    else:
        f_new = 0.5 * (K[0, 0] + K[1, 1])

    weak = np.nonzero(np.asarray(ver.inliers_weak)[:n])[0]
    if len(weak) == 0:
        return False
    cam0 = np.concatenate([center, np.zeros(3), [f_new], np.zeros(2)])
    with stage("refine_camera"):
        cam, Rn, inl = refine_camera_iterative(
            scene, img, cam0, R, pts3[weak], projs[weak],
            adjust_focal=not cfg.fixed_focal_length)
    width = scene.dims[img][0]
    if len(inl) < 8 or cam[6] < 0.1 * width:
        log(f"[BundleInitializeImage] {img}: bad camera "
            f"({len(inl)} inliers, f={cam[6]:.1f})")
        return False

    # Connect the inlier keys to their points (src/Bundle.cpp:3238-3247).
    for i in inl:
        gi = weak[i]
        recon.key_extra[img][keys[gi]] = pt_idx[gi]
        recon.pt_views[pt_idx[gi]].append((cam_slot, keys[gi]))
    recon.added_order.append(img)
    recon.cam_R.append(Rn)
    recon.cam_params.append(cam)
    counter("images_registered")
    log(f"[BundleInitializeImage] {img}: registered with {len(inl)} points, "
        f"f={cam[6]:.2f}")
    return True


# --------------------------------------------------------------------------
# Point addition
# --------------------------------------------------------------------------

def add_all_new_points(recon: Reconstruction, scene: Scene) -> int:
    """`BundleAdjustAddAllNewPoints` (src/BundleAdd.cpp:193-427): gather
    sub-tracks visible in >= 2 registered cameras, gate by ray angle >= 2°,
    triangulate, gate by reprojection <= 16 px and cheirality."""
    cfg = scene.config
    # Gather candidate sub-tracks.
    cand: Dict[int, List[Tuple[int, int]]] = {}
    for slot, img in enumerate(recon.added_order):
        for tr, key in zip(scene.visible_points[img],
                           scene.visible_keys[img]):
            if recon.track_extra[tr] != -1:
                continue          # already a point
            if recon.key_extra[img].get(key, -1) != -1:
                continue          # outlier (-2) or already connected
            cand.setdefault(tr, []).append((slot, key))
    tracks = [(tr, views) for tr, views in cand.items()
              if len(views) >= max(2, cfg.min_track_views)]
    if not tracks:
        return 0

    T = len(tracks)
    # Power-of-2 view padding: the max track length creeps up each round,
    # and each new M is a new triangulation program shape on the device.
    M = _bucket(max(len(v) for _, v in tracks), 4)
    dt = _dt(cfg)
    # Vectorized fill (a per-(track, view) Python loop here costs ~1s/round
    # at 64-image scale): flatten all views, fancy-index camera state.
    import itertools
    counts = np.fromiter((len(v) for _, v in tracks), dtype=np.int64,
                         count=T)
    total = int(counts.sum())
    flat = np.fromiter(
        itertools.chain.from_iterable(
            itertools.chain.from_iterable(v for _, v in tracks)),
        dtype=np.int64, count=2 * total).reshape(-1, 2)
    slots, keys = flat[:, 0], flat[:, 1]
    ti_f = np.repeat(np.arange(T), counts)
    vi_f = np.arange(total) - np.repeat(
        np.cumsum(counts) - counts, counts)
    cam_arr = np.stack(recon.cam_params).astype(dt)     # [C,9]
    R_arr = np.stack(recon.cam_R).astype(dt)            # [C,3,3]
    added = np.asarray(recon.added_order, dtype=np.int64)

    xy = np.zeros((T, M, 2), dt)
    fs = np.ones((T, M), dt)
    ks = np.zeros((T, M, 2), dt)
    Rs = np.broadcast_to(np.eye(3, dtype=dt), (T, M, 3, 3)).copy()
    cs = np.zeros((T, M, 3), dt)
    mask = np.zeros((T, M), dtype=bool)
    img_f = added[slots]
    xy_f = np.empty((total, 2), dt)
    for img in np.unique(img_f):
        sel = img_f == img
        xy_f[sel] = scene.key_xy[img][keys[sel]]
    xy[ti_f, vi_f] = xy_f
    fs[ti_f, vi_f] = cam_arr[slots, 6]
    ks[ti_f, vi_f] = cam_arr[slots, 7:9]
    Rs[ti_f, vi_f] = R_arr[slots]
    cs[ti_f, vi_f] = cam_arr[slots, 0:3]
    mask[ti_f, vi_f] = True

    # Ray-angle conditioning (src/BundleAdd.cpp:272-337): max pairwise
    # angle >= ray_angle_threshold.  Vectorized: ray = Rᵀ·(x/f, y/f, -1).
    v = np.concatenate([xy / fs[..., None], -np.ones((T, M, 1), dt)], axis=2)
    rays = np.einsum("tmi,tmij->tmj", v, Rs)        # == Rᵀ v per view
    rays = np.where(mask[..., None], rays, 0.0)
    norms = np.linalg.norm(rays, axis=2, keepdims=True)
    norms[norms == 0] = 1.0
    rn = rays / norms
    # Monotone dot-space test (max pairwise angle >= thr ⟺ min pairwise
    # dot <= cos(thr)) — no arccos/degrees pass over the [T, M, M] table
    # (same rework as remove_bad_points; host time, every round).
    dots = np.einsum("tmi,tni->tmn", rn.astype(np.float32),
                     rn.astype(np.float32))
    pair_mask = mask[:, :, None] & mask[:, None, :]
    min_dot = np.where(pair_mask, dots, 2.0).min(axis=(1, 2))
    cos_thr = max(np.cos(np.radians(cfg.ray_angle_threshold)), -1 + 1e-8)
    conditioned = min_dot <= cos_thr

    if not cfg.panorama_mode:
        # Triangulate all candidates at once.
        counter("dispatches")
        # Pad the track count to a power-of-2 bucket: T differs every
        # registration round, and an unpadded T is a fresh device program
        # shape per round (costly per-process load on the remote backend).
        # Padded rows are all-masked; their outputs are sliced away.
        Tp = _bucket(T, 64)
        if Tp > T:
            def _padT(a, fill=0.0):
                out = np.full((Tp,) + a.shape[1:], fill, a.dtype)
                out[:T] = a
                return out
            xy_d, ks_d, cs_d = _padT(xy), _padT(ks), _padT(cs)
            fs_d = _padT(fs, 1.0)
            Rs_d = np.broadcast_to(np.eye(3, dtype=dt),
                                   (Tp, M, 3, 3)).copy()
            Rs_d[:T] = Rs
            mask_d = np.zeros((Tp, M), dtype=bool)
            mask_d[:T] = mask
        else:
            xy_d, fs_d, ks_d, Rs_d, cs_d, mask_d = xy, fs, ks, Rs, cs, mask
        X, err = triangulate_tracks_pixels(
            jnp.asarray(xy_d), jnp.asarray(fs_d), jnp.asarray(ks_d),
            jnp.asarray(Rs_d), jnp.asarray(cs_d), jnp.asarray(mask_d))
        X = np.asarray(X)[:T]
        err = np.asarray(err)[:T]
    else:
        # Panorama mode: place each track on its first view's ray
        # (`GeneratePointAtInfinity`, src/BundleAdd.cpp:129-176, selected at
        # :342-348): X = c0 + R0^T K0^{-1} (x, y, 1)-ray, unit length.
        X = cs[:, 0] + rn[:, 0]
        # Reprojection error across all views of the track (the reference
        # leaves `error` unset here; we gate on the real residual).
        q = np.einsum("tmij,tmj->tmi", Rs, X[:, None, :] - cs)
        qz = np.where(np.abs(q[:, :, 2]) < 1e-12, -1e-12, q[:, :, 2])
        u = -q[:, :, :2] / qz[:, :, None]
        r2 = (u ** 2).sum(axis=2)
        distort = 1.0 + ks[:, :, 0] * r2 + ks[:, :, 1] * r2 * r2
        pred = fs[..., None] * distort[..., None] * u
        d = np.linalg.norm(pred - xy, axis=2)
        err = np.where(mask, d, 0.0).sum(axis=1) / \
            np.maximum(mask.sum(axis=1), 1)

    # Cheirality for every view (src/BundleAdd.cpp:359-378).
    q = np.einsum("tmij,tmj->tmi", Rs, X[:, None, :] - cs)
    in_front = np.where(mask, q[:, :, 2] < 0.0, True).all(axis=1)

    good = conditioned & np.isfinite(err) & \
        (err <= ADD_REPROJECTION_ERROR) & in_front
    n_added = 0
    for ti, (tr, views) in enumerate(tracks):
        if not good[ti]:
            continue
        pt_idx = len(recon.points)
        recon.points.append(X[ti])
        img0 = recon.added_order[views[0][0]]
        recon.colors.append(scene.color_of_key(img0, views[0][1]))
        recon.pt_views.append(list(views))
        recon.track_extra[tr] = pt_idx
        for (slot, key) in views:
            recon.key_extra[recon.added_order[slot]][key] = pt_idx
        n_added += 1
    log(f"[AddAllNewPoints] Added {n_added} / {T} candidate tracks "
        f"(ill-conditioned {int((~conditioned).sum())}, "
        f"high-reproj {int((err > ADD_REPROJECTION_ERROR).sum())}, "
        f"behind {int((~in_front).sum())})")
    return n_added


def remove_bad_points(recon: Reconstruction, scene: Scene) -> int:
    """`RemoveBadPointsAndCameras` (src/Bundle.cpp:4190-4261): drop points
    whose max pairwise ray angle (point->camera-center rays) is below
    0.5·ray_angle_threshold."""
    cfg = scene.config
    import itertools
    P = len(recon.points)
    counts = np.fromiter(map(len, recon.pt_views), dtype=np.int64, count=P)
    live = np.nonzero(counts > 0)[0]
    if len(live) == 0:
        log("[RemoveBadPointsAndCameras] Pruned 0 points")
        return 0
    # Vectorized max pairwise ray angle (the per-point O(V²) Python loop
    # cost seconds per round at 40k+ points): padded [L, M, 3] ray tables.
    M = int(counts[live].max())
    total = int(counts[live].sum())
    flat_slots = np.fromiter(
        itertools.chain.from_iterable(
            (v[0] for v in recon.pt_views[p]) for p in live),
        dtype=np.int64, count=total)
    li = np.repeat(np.arange(len(live)), counts[live])
    vi = np.arange(total) - np.repeat(
        np.cumsum(counts[live]) - counts[live], counts[live])
    cam_c = np.stack(recon.cam_params)[:, 0:3]
    pos = np.stack([recon.points[p] for p in live])
    rays_f = pos[li] - cam_c[flat_slots]
    n = np.linalg.norm(rays_f, axis=1, keepdims=True)
    valid_f = n[:, 0] > 0
    rays_f = np.divide(rays_f, n, out=np.zeros_like(rays_f), where=n > 0)
    rays = np.zeros((len(live), M, 3))
    vmask = np.zeros((len(live), M), bool)
    rays[li, vi] = rays_f
    vmask[li, vi] = valid_f
    # Chunk the [chunk, M, M] pairwise tables to bound memory (M can reach
    # the camera count for long tracks).
    # Max pairwise angle is monotone in the MIN pairwise dot of unit rays:
    # max_angle < thr  ⟺  min_dot > cos(thr).  Comparing dots directly
    # deletes the arccos/degrees transcendental pass over the [L, M, M]
    # table (~1 s/round of host time at 30k points in the round-4 profile).
    min_dot = np.full(len(live), 2.0, np.float32)
    rays = rays.astype(np.float32)
    iu = np.triu_indices(M, 1)
    step = max(1, int(4e7 // max(M * M, 1)))
    for s in range(0, len(live), step):
        r = rays[s:s + step]
        vm = vmask[s:s + step]
        dots = np.einsum("lmi,lni->lmn", r, r)
        pair_ok = vm[:, :, None] & vm[:, None, :]
        if M > 1:
            d = np.where(pair_ok, dots, 2.0)[:, iu[0], iu[1]]
            min_dot[s:s + step] = d.min(axis=1)
    # clip(-1+1e-8, 1-1e-8) parity with the old arccos path: a dot of
    # exactly 1.0 still counted as angle > 0 there only via the clip;
    # cos() of the threshold reproduces the same boundary behavior.
    cos_thr = np.cos(np.radians(0.5 * cfg.ray_angle_threshold))
    cos_thr = min(cos_thr, 1.0 - 1e-8)
    bad = live[min_dot > cos_thr]
    for p in bad:
        for (slot, key) in recon.pt_views[p]:
            recon.key_extra[recon.added_order[slot]][key] = -1
        recon.pt_views[p] = []
        recon.colors[p] = np.array([0.0, 0.0, 255.0])
    log(f"[RemoveBadPointsAndCameras] Pruned {len(bad)} points")
    return len(bad)


def estimate_ignored_cameras(recon: Reconstruction, scene: Scene,
                             seed: int = 0) -> int:
    """`EstimateIgnoredCameras` (src/Bundle.cpp:1887-1990): after the main
    loop, attempt to register every ignored image, motion-only bundle, add
    points with relaxed gates (min_views=2), then one more registration
    sweep."""
    def sweep():
        n_added = 0
        for img in range(scene.num_images):
            if not scene.ignore_in_bundle[img]:
                continue
            if recon.slot_of_image(img) is not None:
                continue
            ok = bundle_initialize_image(recon, scene, img,
                                         recon.num_cameras,
                                         seed=seed + 71 * img)
            if ok:
                n_added += 1
        return n_added

    added = sweep()
    if added:
        run_sfm(recon, scene, fix_points=True, verbose=False)
        add_all_new_points(recon, scene)
        added += sweep()
    log(f"[EstimateIgnoredCameras] Recovered {added} cameras")
    return added


def bundle_adjust_slow(scene: Scene, out_dir: Optional[str] = None,
                       seed: int = 0) -> Reconstruction:
    """The one-camera-at-a-time variant (`BundleAdjust`,
    src/Bundle.cpp:2069 — the non-fast path selected by --slow_bundle):
    identical machinery, but each round registers ONLY the best-connected
    image before re-bundling."""
    cfg = scene.config
    i_best, j_best = pick_initial_pair(scene, True)
    log(f"[BundleAdjustSlow] Initial pair: {i_best}, {j_best}")
    recon = setup_initial_pair(scene, i_best, j_best, seed=seed)
    run_sfm(recon, scene, remove_outliers=not cfg.fix_necker)
    if cfg.fix_necker:
        fix_necker_reversal(recon, scene)
    while recon.num_cameras < scene.num_images:
        if cfg.construct_max_connectivity:
            img, max_matches = find_camera_with_most_connectivity(
                recon, scene)
            if img < 0:
                break
        else:
            counts = find_candidate_images(recon, scene)
            if not counts:
                break
            img, max_matches = max(counts.items(), key=lambda kv: kv[1])
        if max_matches < cfg.min_max_matches:
            break
        ok = bundle_initialize_image(recon, scene, img, recon.num_cameras,
                                     seed=seed + 31 * img)
        if not ok:
            scene.ignore_in_bundle[img] = True
            continue
        if not cfg.skip_add_points:
            with stage("add_points"):
                add_all_new_points(recon, scene)
        if not cfg.skip_full_bundle:
            run_sfm(recon, scene)
            with stage("prune"):
                remove_bad_points(recon, scene)
        if out_dir:
            dump_round(recon, scene, out_dir, recon.num_cameras)
    if out_dir and cfg.bundle_output_file:
        write_bundle_file(os.path.join(out_dir, cfg.bundle_output_file),
                          to_bundle_file(recon, scene))
    return recon


def write_match_table(scene: Scene, append: str = "",
                      directory: str = ".") -> None:
    """Match-table snapshot nmatches<ext>.txt / matches<ext>.txt
    (`WriteMatchTable`, src/BundleIO.cpp:1044-1111)."""
    from bundler_sfm_tpu.io.matchfile import (
        write_match_table as _write_table,
    )
    nonempty = {p: m for p, m in scene.matches.items()
                if m is not None and len(m)}
    _write_table(scene.num_images, nonempty, append, directory)


# --------------------------------------------------------------------------
# Output
# --------------------------------------------------------------------------

def to_bundle_file(recon: Reconstruction, scene: Scene) -> BundleFile:
    """Final scene -> BundleFile (DumpOutputFile, src/BundleIO.cpp:730-875)."""
    cams = []
    slot_of = {img: s for s, img in enumerate(recon.added_order)}
    for i in range(scene.num_images):
        s = slot_of.get(i)
        if s is None:
            cams.append(BundleCamera(f=0.0, k1=0.0, k2=0.0,
                                     R=np.zeros((3, 3)), t=np.zeros(3)))
        else:
            cp = recon.cam_params[s]
            R = recon.cam_R[s]
            cams.append(BundleCamera(
                f=float(cp[6]), k1=float(cp[7]), k2=float(cp[8]),
                R=R.copy(), t=-R @ cp[0:3]))
    pts = []
    for p in range(len(recon.points)):
        views = recon.pt_views[p]
        if len(views) == 0:
            continue
        v = np.zeros((len(views), 4))
        for k, (slot, key) in enumerate(views):
            img = recon.added_order[slot]
            v[k] = [img, key, scene.key_xy[img][key][0],
                    scene.key_xy[img][key][1]]
        pts.append(BundlePoint(pos=recon.points[p].copy(),
                               color=recon.colors[p].copy(), views=v))
    return BundleFile(cameras=cams, points=pts)


def dump_round(recon: Reconstruction, scene: Scene, out_dir: str,
               round_id: int) -> None:
    cfg = scene.config
    os.makedirs(out_dir, exist_ok=True)
    if cfg.output_all and cfg.bundle_output_base:
        path = os.path.join(out_dir,
                            f"{cfg.bundle_output_base}{round_id:03d}.out")
        write_bundle_file(path, to_bundle_file(recon, scene))
    live = [p for p in range(len(recon.points)) if recon.pt_views[p]]
    if live:
        write_points_ply(
            os.path.join(out_dir, f"points{round_id:03d}.ply"),
            np.stack([recon.points[p] for p in live]),
            np.stack([recon.colors[p] for p in live]),
            np.stack(recon.cam_R),
            np.stack([c[0:3] for c in recon.cam_params]))


# --------------------------------------------------------------------------
# Main driver
# --------------------------------------------------------------------------

def bundle_adjust_fast(scene: Scene, out_dir: Optional[str] = None,
                       seed: int = 0) -> Reconstruction:
    """The full incremental loop (`BundleAdjustFast`,
    src/BundleFast.cpp:37-526)."""
    from bundler_sfm_tpu.utils import get_telemetry
    with stage("total", verbose=True):
        recon = _bundle_adjust_fast(scene, out_dir, seed)
    rep = get_telemetry().report()
    log("[Telemetry] stage seconds: " + ", ".join(
        f"{k}={v:.1f}" for k, v in sorted(
            rep["stages_s"].items(), key=lambda kv: -kv[1])))
    log(f"[Telemetry] device dispatches: "
        f"{int(rep['counters'].get('dispatches', 0))}")
    return recon


def _bundle_adjust_fast(scene: Scene, out_dir: Optional[str] = None,
                        seed: int = 0) -> Reconstruction:
    cfg = scene.config
    with stage("init_pair"):
        i_best, j_best = pick_initial_pair(scene, True)
        log(f"[BundleAdjust] Initial pair: {i_best}, {j_best}")
        recon = setup_initial_pair(scene, i_best, j_best, seed=seed)
    run_sfm(recon, scene, remove_outliers=not cfg.fix_necker)
    if cfg.fix_necker:
        fix_necker_reversal(recon, scene)
    if out_dir:
        dump_round(recon, scene, out_dir, recon.num_cameras)

    round_id = 0
    while recon.num_cameras < scene.num_images:
        counts = find_candidate_images(recon, scene)
        if not counts:
            break
        max_matches = max(counts.values())
        if max_matches < cfg.min_max_matches:
            log(f"[BundleAdjust] No more connections (max {max_matches})")
            break
        n_needed = int(round(0.75 * max_matches))
        if cfg.num_matches_add_camera > 0:
            n_needed = min(n_needed, cfg.num_matches_add_camera)
        batch_imgs = [i for i, c in counts.items() if c >= n_needed]
        log(f"[BundleAdjustFast] Registering {len(batch_imgs)} images "
            f"(>= {n_needed} matches)")
        with stage("register"):
            registered = bundle_initialize_images(
                recon, scene, batch_imgs, seed=seed + 131 * round_id)
        added_any = bool(registered)
        for img in batch_imgs:
            if img not in registered:
                scene.ignore_in_bundle[img] = True
        if not added_any:
            round_id += 1
            continue
        if not cfg.skip_add_points:
            with stage("add_points"):
                add_all_new_points(recon, scene)
        if not cfg.skip_full_bundle:
            run_sfm(recon, scene)
            with stage("prune"):
                remove_bad_points(recon, scene)
        if out_dir:
            dump_round(recon, scene, out_dir, recon.num_cameras)
        round_id += 1

    if cfg.estimate_ignored:
        estimate_ignored_cameras(recon, scene, seed=seed)

    if out_dir and cfg.bundle_output_file:
        write_bundle_file(os.path.join(out_dir, cfg.bundle_output_file),
                          to_bundle_file(recon, scene))
    log(f"[BundleAdjust] Done: {recon.num_cameras} cameras, "
        f"{sum(1 for v in recon.pt_views if v)} points")
    return recon
