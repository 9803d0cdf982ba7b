"""Localize a new image against an existing model.

The role of `BundleRegisterImage` (`src/Bundle.cpp:3692-4188`): coalesce one
descriptor per 3D point from its member keys (the averaging of
`BundlerGeometry.cpp:443-622`), 2-NN match the new image's descriptors
against them on the MXU (`MatchKeysToPoints`, `BundlerGeometry.cpp:624-750`),
then DLT-RANSAC resection + iterative refinement — the same estimator stack
as in-loop registration.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bundler_sfm_tpu.config import BundlerConfig
from bundler_sfm_tpu.io.bundlefile import BundleFile
from bundler_sfm_tpu.ops.matching import match_pair, prune_double_matches
from bundler_sfm_tpu.ops.resection import find_and_verify_camera
from bundler_sfm_tpu.pipeline.incremental import (
    _bucket, refine_camera_iterative,
)
from bundler_sfm_tpu.pipeline.scene import Scene


def coalesce_point_descriptors(
    bundle: BundleFile,
    key_descs: Sequence[np.ndarray],
) -> np.ndarray:
    """Mean descriptor per 3D point over its views' keys (uint8 [P, 128])."""
    out = np.zeros((len(bundle.points), 128), dtype=np.float64)
    for pi, p in enumerate(bundle.points):
        count = 0
        for v in p.views:
            img, key = int(v[0]), int(v[1])
            if img < len(key_descs) and key_descs[img] is not None \
                    and key < len(key_descs[img]):
                out[pi] += key_descs[img][key]
                count += 1
        if count:
            out[pi] /= count
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def points_near_cameras(bundle: BundleFile, drop_pt: np.ndarray,
                        num_nns: int = 20) -> np.ndarray:
    """Indices of 3D points visible from the `num_nns` registered cameras
    nearest to a position guess — the camera-neighborhood prefilter of
    `BundleRegisterImage` (`src/Bundle.cpp:3722-3790`: CreateCameraSearchTree
    + NUM_NNS=20).  The ANN camera tree becomes one batched distance
    computation; the returned subset keeps per-registration matching cost
    flat in the total point count at scale."""
    regs = np.array([i for i, c in enumerate(bundle.cameras) if c.f > 0])
    if len(regs) == 0:
        return np.arange(len(bundle.points))
    centers = np.stack([-bundle.cameras[i].R.T @ bundle.cameras[i].t
                        for i in regs])
    d2 = ((centers - np.asarray(drop_pt)[None]) ** 2).sum(axis=1)
    near = set(int(i) for i in regs[np.argsort(d2)[:num_nns]])
    keep = [pi for pi, p in enumerate(bundle.points)
            if any(int(v[0]) in near for v in p.views)]
    return np.array(keep, dtype=np.int64)


def register_image(
    bundle: BundleFile,
    point_descs: np.ndarray,          # [P,128] coalesced descriptors
    new_desc: np.ndarray,             # [K,128] new image's descriptors
    new_xy: np.ndarray,               # [K,2] centered coords
    config: Optional[BundlerConfig] = None,
    ratio: float = 0.6,
    seed: int = 0,
    drop_pt: Optional[np.ndarray] = None,
    num_nns: int = 20,
) -> Optional[Dict]:
    """Estimate the new image's camera.  Returns None on failure, else a
    dict with R, center, f, k, inliers, matches.

    With `drop_pt` (a position guess — the reference's m_drop_pt,
    `src/Bundle.cpp:3730`), only points visible from the `num_nns` nearest
    registered cameras are matched, as BundleRegisterImage's init_location
    path does."""
    cfg = config or BundlerConfig()
    if drop_pt is not None:
        subset = points_near_cameras(bundle, drop_pt, num_nns)
        if len(subset) == 0:
            return None
        matches = prune_double_matches(match_pair(
            new_desc, point_descs[subset], ratio=ratio))
        if len(matches):
            matches = np.stack(
                [matches[:, 0], subset[matches[:, 1]]], axis=1
            ).astype(np.int32)
    else:
        matches = prune_double_matches(match_pair(new_desc, point_descs,
                                                  ratio=ratio))
    if len(matches) < cfg.min_max_matches:
        return None
    X = np.stack([bundle.points[int(m[1])].pos for m in matches])
    x = new_xy[matches[:, 0]]
    n = len(X)
    pad = _bucket(n, 64)
    Xp = np.zeros((pad, 3)); Xp[:n] = X
    xp = np.zeros((pad, 2)); xp[:n] = x
    ver = find_and_verify_camera(
        jax.random.PRNGKey(seed), jnp.asarray(Xp), jnp.asarray(xp),
        jnp.int32(n), jnp.float64(cfg.projection_estimation_threshold),
        jnp.float64(16.0 * cfg.projection_estimation_threshold),
        num_rounds=cfg.projection_rounds)
    if not bool(ver.ok):
        return None
    K = np.asarray(ver.K)
    R = np.asarray(ver.R)
    t = np.asarray(ver.t)
    center = -R.T @ t
    f0 = 0.5 * (K[0, 0] + K[1, 1])
    weak = np.nonzero(np.asarray(ver.inliers_weak)[:n])[0]
    if len(weak) < 8:
        return None
    cam0 = np.concatenate([center, np.zeros(3), [f0], np.zeros(2)])

    # Minimal scene shim for the shared refiner.
    class _Shim:
        config = cfg

        @staticmethod
        def has_init_focal(_):
            return False

        @staticmethod
        def init_focal(_):
            return 0.0

    cam, Rn, inl = refine_camera_iterative(
        _Shim, 0, cam0, R, X[weak], x[weak], adjust_focal=True)
    if len(inl) < 8:
        return None
    return dict(R=Rn, center=cam[0:3], f=float(cam[6]),
                k=(float(cam[7]), float(cam[8])),
                num_inliers=len(inl),
                matches=matches, inlier_idx=weak[inl])


def match_keys_to_points(new_desc: np.ndarray, point_descs: np.ndarray,
                         ratio: float = 0.6) -> np.ndarray:
    """2-NN + ratio match of a new image's descriptors against coalesced
    point descriptors (`MatchKeysToPoints`, `BundlerGeometry.cpp:624-685`);
    one MXU distance matmul instead of an ANN tree."""
    return prune_double_matches(match_pair(new_desc, point_descs,
                                           ratio=ratio))


def match_points_to_keys(point_descs: np.ndarray, new_desc: np.ndarray,
                         ratio: float = 0.6) -> np.ndarray:
    """The reverse direction (`MatchPointsToKeys`,
    `BundlerGeometry.cpp:687-750`): queries are the point descriptors,
    the tree is the new image's keys.  Rows are (point, key)."""
    return prune_double_matches(match_pair(point_descs, new_desc,
                                           ratio=ratio))


def refine_points(points: np.ndarray, projs: np.ndarray,
                  views_pv: list, views_R: list, views_c: list,
                  cam: np.ndarray, R_cam: np.ndarray) -> tuple:
    """Re-triangulate each point from its existing views PLUS the new
    camera's observation, then report the RMS reprojection error in the new
    camera (`RefinePoints`, `src/Bundle.cpp:2697-2775`).

    views_pv[i]: [v,2] NEGATED normalized coords per existing view of point
    i (the reference's ray convention); views_R/views_c: per-view [v,3,3] /
    [v,3].  projs: [N,2] pixel observations in the new camera.
    """
    from bundler_sfm_tpu.ops.triangulate import triangulate_tracks
    n = len(points)
    if n == 0:
        return np.array(points, copy=True), 0.0
    f = cam[6]
    # One batched padded dispatch instead of a per-point device call.
    counts = np.array([len(v) + 1 for v in views_pv])
    M = max(4, int(counts.max()))
    Np = _bucket(n, 64)
    pv = np.zeros((Np, M, 2))
    Rs = np.broadcast_to(np.eye(3), (Np, M, 3, 3)).copy()
    cs = np.zeros((Np, M, 3))
    mask = np.zeros((Np, M), bool)
    for i in range(n):
        v = len(views_pv[i])
        pv[i, :v] = views_pv[i]
        pv[i, v] = -projs[i] / f
        Rs[i, :v] = views_R[i]
        Rs[i, v] = R_cam
        cs[i, :v] = views_c[i]
        cs[i, v] = cam[0:3]
        mask[i, :v + 1] = True
    ts = np.einsum("pvij,pvj->pvi", Rs, -cs)
    from bundler_sfm_tpu.utils import counter
    counter("dispatches")
    X, _ = triangulate_tracks(jnp.asarray(pv), jnp.asarray(Rs),
                              jnp.asarray(ts), jnp.asarray(mask), 5)
    out = np.asarray(X)[:n]
    # RMS reprojection error in the NEW camera (the value RefinePoints
    # reports, src/Bundle.cpp:2750-2771).
    q = np.einsum("ij,pj->pi", R_cam, out - cam[0:3])
    u = -f * q[:, 0:2] / q[:, 2:3]
    rsq = np.sum(u * u, axis=1) / (f * f)
    u = u * (1.0 + cam[7] * rsq + cam[8] * rsq * rsq)[:, None]
    errs = ((u - projs) ** 2).sum(axis=1)
    return out, float(np.sqrt(errs.mean()))


def refine_camera_and_points(scene, cam0: np.ndarray, R0: np.ndarray,
                             points: np.ndarray, projs: np.ndarray,
                             views_pv: list, views_R: list, views_c: list,
                             adjust_focal: bool = True,
                             max_rounds: int = 4,
                             error_tol: float = 1e-3) -> tuple:
    """Alternate single-camera refinement and point re-triangulation until
    the error stops improving (`RefineCameraAndPoints`,
    `src/Bundle.cpp:2777-2884`).  Returns (cam, R, points, inlier_idx)."""
    cam, R = np.array(cam0, copy=True), np.array(R0, copy=True)
    pts = np.array(points, copy=True)
    error_old = np.inf
    inl = np.arange(len(pts))
    for _ in range(max_rounds):
        cam, R, inl_local = refine_camera_iterative(
            scene, 0, cam, R, pts[inl], projs[inl], adjust_focal)
        inl = inl[inl_local]
        if len(inl) < 6:
            break
        new_pts, error = refine_points(
            pts[inl], projs[inl],
            [views_pv[i] for i in inl], [views_R[i] for i in inl],
            [views_c[i] for i in inl], cam, R)
        pts[inl] = new_pts
        if error_old - error < error_tol:
            break
        error_old = error
    return cam, R, pts, inl
