"""Two-frame models and camera covariance.

Reference `src/TwoFrameModel.h:36-110` / `src/BundleTwo.cpp`
(`BundleTwoFrame` `:491` — a two-camera reconstruction per image pair used
for pair scoring and relative-pose export — and `ComputeCameraCovariance`
`:1748-1990`, which re-bundles with point constraints and reads the camera
covariance off the Schur complement).

Here a TwoFrameModel is produced by the same TPU stack as the main loop:
5-point init → two-view triangulation → 2-camera Schur-LM; covariance comes
from inverting the converged (undamped) reduced camera system S — the block
SBA exports as Sout.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bundler_sfm_tpu.config import BundlerConfig
from bundler_sfm_tpu.ops.ba import (
    BAProblem, CNP, assemble_schur, build_normal_blocks, build_problem,
    run_ba,
)
from bundler_sfm_tpu.ops.essential import pose_to_center
from bundler_sfm_tpu.ops.linalg_small import cholesky_solve
from bundler_sfm_tpu.ops import ba as _ba_ops
from bundler_sfm_tpu.ops.fivepoint import estimate_pose_5point
from bundler_sfm_tpu.ops.triangulate import triangulate_two_view
from bundler_sfm_tpu.pipeline.scene import Scene
from bundler_sfm_tpu.pipeline.tracks import matches_from_tracks


@dataclasses.dataclass
class TwoFrameModel:
    """Pairwise reconstruction (fields of `src/TwoFrameModel.h:81-91`)."""
    num_points: int
    points: np.ndarray          # [n,3]
    keys1: np.ndarray           # [n]
    keys2: np.ndarray           # [n]
    R0: np.ndarray              # camera 0 (identity frame)
    c0: np.ndarray
    f0: float
    R1: np.ndarray
    c1: np.ndarray
    f1: float
    C0: np.ndarray              # [3,3] camera-0 position covariance
    C1: np.ndarray              # [3,3] camera-1 position covariance
    angle: float                # median triangulation angle (degrees)
    error: float                # mean reprojection error

    def write(self, f) -> None:
        """Text serialization compatible in spirit with
        `TwoFrameModel::Write` (`src/TwoFrameModel.cpp:137-168`)."""
        f.write(f"{self.num_points}\n{self.angle:0.9f}\n{self.error:0.9f}\n")
        for i in range(self.num_points):
            p = self.points[i]
            f.write(f"-1 {self.keys1[i]} {self.keys2[i]} "
                    f"{p[0]:0.16e} {p[1]:0.16e} {p[2]:0.16e}\n")
        for R, c, fo in ((self.R0, self.c0, self.f0),
                         (self.R1, self.c1, self.f1)):
            t = -R @ c
            f.write(f"{fo:0.9f}\n")
            f.write(" ".join(f"{v:0.16e}" for v in R.reshape(-1)) + "\n")
            f.write(" ".join(f"{v:0.16e}" for v in t) + "\n")
        for C in (self.C0, self.C1):
            f.write(" ".join(f"{v:0.16e}" for v in C.reshape(-1)) + "\n")


ModelTable = Dict[Tuple[int, int], TwoFrameModel]


def camera_covariance(prob: BAProblem, cam, pts,
                      pt_constraint_weight: float = 1.0) -> np.ndarray:
    """Covariance of camera parameters at a solution: inv(S) of the
    UNDAMPED reduced camera system (role of `ComputeCameraCovariance`,
    `src/BundleTwo.cpp:1748-1990`).

    The reference fixes the gauge by re-bundling with POINT CONSTRAINTS at
    the converged structure before reading off S — same here: a quadratic
    prior anchoring every point makes S positive definite without biasing
    the camera blocks.  Returns [C*9, C*9]."""
    pts_np = np.asarray(pts)
    anchored = prob._replace(
        pt_constrained=jnp.ones(pts_np.shape[0], dtype=pts.dtype),
        pt_constraints=jnp.asarray(pts_np),
        pt_weight=jnp.asarray(pt_constraint_weight, pts.dtype),
        # Covariance must come out in RAW parameter units, not the LM's
        # scaled q-space — disable f/k column scaling for this solve.
        cam_scale=jnp.ones_like(prob.cam_scale))
    U, V, W, g_c, g_p, _ = build_normal_blocks(cam, pts, anchored, False)
    frozen = 1.0 - prob.cam_mask
    U_aug = U + jax.vmap(jnp.diag)(frozen)
    Vinv = _ba_ops._inv3(V + 1e-12 * jnp.eye(3, dtype=V.dtype)[None])
    Y = jnp.einsum("oij,ojk->oik", W, Vinv[anchored.obs_pt])
    S, _ = assemble_schur(U_aug, Y, W, g_c, g_p, anchored)
    C = S.shape[0]
    Sd = S.transpose(0, 2, 1, 3).reshape(C * CNP, C * CNP)
    # inv(S) with S SPD — column-wise unrolled Cholesky solves (TPU-safe f64).
    eye = jnp.eye(C * CNP, dtype=Sd.dtype)
    cov = jax.vmap(lambda col: cholesky_solve(Sd, col), out_axes=1)(eye)
    return np.asarray(0.5 * (cov + cov.T))


def bundle_two_frame(scene: Scene, i1: int, i2: int,
                     seed: int = 0) -> Optional[TwoFrameModel]:
    """`BundleTwoFrame` (`src/BundleTwo.cpp:491`): full two-camera
    reconstruction of a pair from its shared tracks."""
    cfg = scene.config
    pair_matches = matches_from_tracks(scene.tracks, i1, i2)
    if len(pair_matches) < cfg.min_max_matches:
        return None
    f1 = scene.init_focal(i1) or cfg.init_focal_length
    f2 = scene.init_focal(i2) or cfg.init_focal_length
    x1 = scene.key_xy[i1][pair_matches[:, 0]]
    x2 = scene.key_xy[i2][pair_matches[:, 1]]
    n = len(pair_matches)
    pad = 64
    while pad < n:
        pad *= 2
    x1p = np.zeros((pad, 2)); x1p[:n] = x1
    x2p = np.zeros((pad, 2)); x2p[:n] = x2
    R, t, cnt, ok = estimate_pose_5point(
        jax.random.PRNGKey(seed), jnp.asarray(x1p), jnp.asarray(x2p),
        jnp.int32(n), f1, f2, jnp.float64(0.25 * cfg.fmatrix_threshold),
        num_rounds=cfg.fivepoint_rounds)
    if not bool(ok):
        return None
    R1 = np.asarray(R)
    c1 = np.asarray(pose_to_center(R, t))
    R0 = np.eye(3)
    c0 = np.zeros(3)

    # Triangulate all matches; keep those under the projection threshold.
    pts, k1s, k2s, angles = [], [], [], []
    for (k1, k2) in pair_matches:
        p = scene.key_xy[i1][k1]
        q = scene.key_xy[i2][k2]
        X, err = triangulate_two_view(
            jnp.asarray(-p / f1), jnp.asarray(-q / f2),
            jnp.asarray(R0), jnp.asarray(-R0 @ c0),
            jnp.asarray(R1), jnp.asarray(-R1 @ c1))
        if float(err) * 0.5 * (f1 + f2) > cfg.projection_estimation_threshold:
            continue
        X = np.asarray(X)
        pts.append(X)
        k1s.append(int(k1))
        k2s.append(int(k2))
        r1 = X - c0
        r2 = X - c1
        d = r1 @ r2 / max(np.linalg.norm(r1) * np.linalg.norm(r2), 1e-12)
        angles.append(np.degrees(np.arccos(np.clip(d, -1, 1))))
    if len(pts) < cfg.min_max_matches:
        return None
    pts = np.stack(pts)

    # Two-camera bundle.
    obs_cam = np.concatenate([np.zeros(len(pts), np.int32),
                              np.ones(len(pts), np.int32)])
    obs_pt = np.concatenate([np.arange(len(pts), dtype=np.int32)] * 2)
    obs_xy = np.concatenate([scene.key_xy[i1][k1s], scene.key_xy[i2][k2s]])
    cam0 = np.zeros((2, CNP))
    cam0[0, 0:3] = c0
    cam0[0, 6] = f1
    cam0[1, 0:3] = c1
    cam0[1, 6] = f2
    prob = build_problem(np.stack([R0, R1]), cam0, pts, obs_cam, obs_pt,
                         obs_xy, est_focal=not cfg.fixed_focal_length,
                         est_distortion=cfg.estimate_distortion)
    res = run_ba(prob, max_iters=cfg.sfm_max_iters)
    cam = np.asarray(res.cam)
    Rf = np.asarray(res.R)
    ptsf = np.asarray(res.pts)[:len(pts)]
    err = float(np.sqrt(2 * float(res.cost) / max(len(obs_cam), 1)))

    # run_ba folds w into R and zeroes it — evaluate the covariance with the
    # UPDATED base rotations or the Jacobians are taken at the wrong point.
    prob_conv = prob._replace(R0=jnp.asarray(Rf))
    cov = camera_covariance(prob_conv, jnp.asarray(cam),
                            jnp.asarray(np.asarray(res.pts)))
    # Position covariance blocks: params 0:3 of each camera.
    C0 = cov[0:3, 0:3]
    C1 = cov[CNP:CNP + 3, CNP:CNP + 3]

    return TwoFrameModel(
        num_points=len(ptsf), points=ptsf,
        keys1=np.array(k1s), keys2=np.array(k2s),
        R0=Rf[0], c0=cam[0, 0:3], f0=float(cam[0, 6]),
        R1=Rf[1], c1=cam[1, 0:3], f1=float(cam[1, 6]),
        C0=C0, C1=C1,
        angle=float(np.median(angles)) if angles else 0.0,
        error=err)


def estimate_relative_pose(scene: Scene, i1: int, i2: int, seed: int = 0
                           ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """`EstimateRelativePose` (src/RelativePose.cpp:36-192): E-matrix RANSAC
    (4x fmatrix rounds at threshold²), homography fallback when >= 75% of the
    epipolar inliers fit an H (planar/rotational scenes), E decomposition
    otherwise.  Returns (R, center) of camera i2 in camera i1's frame."""
    from bundler_sfm_tpu.ops.fmatrix import (
        estimate_ematrix, fmatrix_residual,
    )
    from bundler_sfm_tpu.ops.homography import estimate_homography_ransac
    from bundler_sfm_tpu.ops.homography_decompose import (
        decompose_homography, fundamental_from_pose, homography_pixel_to_ray,
    )
    from bundler_sfm_tpu.ops.essential import decompose_essential_multipt

    cfg = scene.config
    pair_matches = matches_from_tracks(scene.tracks, i1, i2)
    if len(pair_matches) < 8:
        return None
    f1 = scene.init_focal(i1) or cfg.init_focal_length
    f2 = scene.init_focal(i2) or cfg.init_focal_length
    x1 = scene.key_xy[i1][pair_matches[:, 0]]
    x2 = scene.key_xy[i2][pair_matches[:, 1]]
    n = len(pair_matches)
    pad = 64
    while pad < n:
        pad *= 2
    x1p = np.zeros((pad, 2)); x1p[:n] = x1
    x2p = np.zeros((pad, 2)); x2p[:n] = x2
    E, F, inl, cnt = estimate_ematrix(
        jax.random.PRNGKey(seed), jnp.asarray(x1p), jnp.asarray(x2p),
        jnp.int32(n), f1, f2, jnp.float64(cfg.fmatrix_threshold ** 2),
        num_rounds=4 * cfg.fmatrix_rounds)
    if int(cnt) == 0:
        return None
    inl = np.asarray(inl)[:n]
    idx = np.nonzero(inl)[0]

    # Homography on the epipolar inliers (128 rounds @ 6.0,
    # src/RelativePose.cpp:90-94).
    if len(idx) >= 4:
        padh = 64
        while padh < len(idx):
            padh *= 2
        h1 = np.zeros((padh, 2)); h1[:len(idx)] = x1[idx]
        h2 = np.zeros((padh, 2)); h2[:len(idx)] = x2[idx]
        H, hinl, hcnt = estimate_homography_ransac(
            jax.random.PRNGKey(seed + 1), jnp.asarray(h1), jnp.asarray(h2),
            jnp.int32(len(idx)), jnp.float64(6.0), num_rounds=128)
        if int(hcnt) / max(len(idx), 1) >= 0.75:
            H_ray = homography_pixel_to_ray(np.asarray(H), f1, f2)
            sols = decompose_homography(H_ray)
            # Pick the solution whose F explains more matches
            # (src/RelativePose.cpp:129-162).
            best, best_inl = None, -1
            for R, t, _ in sols:
                Fh = fundamental_from_pose(R, t, f1, f2)
                r = np.asarray(fmatrix_residual(
                    jnp.asarray(Fh), jnp.asarray(x2), jnp.asarray(x1)))
                ninl = int((r < cfg.fmatrix_threshold).sum())
                if ninl > best_inl:
                    best, best_inl = (R, t), ninl
            if best is not None and best_inl > 0:
                R, t = best
                return np.asarray(R), np.asarray(-R.T @ t)

    # Default: decompose E (multi-point cheirality vote).
    mask = np.zeros(pad, dtype=bool)
    mask[:n] = inl
    R, t, ok = decompose_essential_multipt(
        E, jnp.asarray(-x1p / f1), jnp.asarray(-x2p / f2), jnp.asarray(mask))
    if not bool(ok):
        return None
    R = np.asarray(R)
    return R, np.asarray(pose_to_center(jnp.asarray(R), t))


def compute_model_table(scene: Scene, seed: int = 0) -> ModelTable:
    """Two-frame models for every pair sharing enough tracks
    (the models the reference builds for pair scoring / relpose output)."""
    out: ModelTable = {}
    n = scene.num_images
    track_sets = [set(vp) for vp in scene.visible_points]
    for i in range(n):
        for j in range(i + 1, n):
            if len(track_sets[i] & track_sets[j]) < \
                    scene.config.min_max_matches:
                continue
            m = bundle_two_frame(scene, i, j, seed=seed + i * n + j)
            if m is not None:
                out[(i, j)] = m
    return out


def write_relative_poses(path: str, models: ModelTable) -> None:
    """Pairwise relative-pose dump (role of `OutputRelativePoses3D`,
    `src/ProcessBundle.cpp:676`)."""
    with open(path, "w") as f:
        f.write(f"{len(models)}\n")
        for (i, j), m in sorted(models.items()):
            R_rel = m.R1 @ m.R0.T
            t_rel = m.R0 @ (m.c1 - m.c0)
            f.write(f"{i} {j} {m.num_points} {m.angle:0.6f} {m.error:0.6f}\n")
            f.write(" ".join(f"{v:0.9e}" for v in R_rel.reshape(-1)) + "\n")
            f.write(" ".join(f"{v:0.9e}" for v in t_rel) + "\n")


def scene_covariance(bundle, estimate_distortion: bool = True,
                     point_weight: float = 1000.0):
    """App-level `--compute_covariance` (`BundlerApp::ComputeCameraCovariance`,
    `src/BundleTwo.cpp:1748-2024`): anchor every point at its converged
    position (weight 1000, `:1758`), form the reduced camera Schur system,
    and return (registered_image_ids, full inv(S), per-camera 3x3
    translation-covariance blocks) — the blocks + their traces are what the
    reference writes to covariance.txt (`:1996-2016`)."""
    regs = [i for i, c in enumerate(bundle.cameras) if c.registered]
    slot = {img: s for s, img in enumerate(regs)}
    R0 = np.stack([bundle.cameras[i].R for i in regs])
    cam0 = np.zeros((len(regs), 9))
    for s, i in enumerate(regs):
        c = bundle.cameras[i]
        cam0[s, 0:3] = c.center
        cam0[s, 6] = c.f
        cam0[s, 7] = c.k1
        cam0[s, 8] = c.k2
    obs_cam, obs_pt, obs_xy = [], [], []
    pts = np.stack([p.pos for p in bundle.points])
    for pi, p in enumerate(bundle.points):
        for (ci, _ki, x, y) in np.atleast_2d(p.views):
            if int(ci) in slot:
                obs_cam.append(slot[int(ci)])
                obs_pt.append(pi)
                obs_xy.append((x, y))
    prob = build_problem(R0, cam0, pts,
                         np.array(obs_cam, np.int32),
                         np.array(obs_pt, np.int32),
                         np.array(obs_xy, np.float64),
                         est_focal=True, est_distortion=estimate_distortion)
    cov = camera_covariance(prob, prob.cam0, prob.pts0,
                            pt_constraint_weight=point_weight)
    blocks = [cov[s * CNP:s * CNP + 3, s * CNP:s * CNP + 3] for s in
              range(len(regs))]
    return regs, cov, blocks


def write_covariance_file(path: str, regs, blocks) -> None:
    """covariance.txt: per registered image `i`, its 3x3 translation
    covariance (row-major) and trace (`src/BundleTwo.cpp:1996-2016`)."""
    with open(path, "w") as f:
        for i, C in zip(regs, blocks):
            f.write(f"{i}\n")
            f.write(" ".join(f"{v:0.6f}" for v in np.asarray(C).ravel()))
            f.write(f"\n{float(np.trace(C)):0.6f}\n")
