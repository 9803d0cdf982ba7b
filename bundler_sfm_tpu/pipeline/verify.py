"""Pairwise geometric verification — the `ComputeGeometricConstraints` stage
(`src/BundlerGeometry.cpp:99-194`): per-pair F-matrix RANSAC filtering of
match lists, homography RANSAC scoring, symmetric lists, then tracks.

TPU shape: pairs are padded to a common size and the RANSAC kernels are
vmapped over the pair batch — every hypothesis of every pair scores at once.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bundler_sfm_tpu.config import BundlerConfig
from bundler_sfm_tpu.ops.fmatrix import estimate_fmatrix_ransac
from bundler_sfm_tpu.ops.homography import estimate_homography_ransac
from bundler_sfm_tpu.ops.matching import symmetrize
from bundler_sfm_tpu.pipeline.scene import Scene, TransformInfo
from bundler_sfm_tpu.utils import counter
from bundler_sfm_tpu.pipeline.tracks import build_tracks, tracks_to_image_tables


def _round_up(n, m):
    return ((n + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("num_rounds",))
def _fmatrix_batch(keys, x1, x2, n_valid, threshold, num_rounds):
    def one(key, a, b, n):
        return estimate_fmatrix_ransac(key, a, b, n, threshold,
                                       num_rounds=num_rounds)
    return jax.vmap(one)(keys, x1, x2, n_valid)


@functools.partial(jax.jit, static_argnames=("num_rounds",))
def _homography_batch(keys, x1, x2, n_valid, threshold, num_rounds):
    def one(key, a, b, n):
        return estimate_homography_ransac(key, a, b, n, threshold,
                                          num_rounds=num_rounds)
    return jax.vmap(one)(keys, x1, x2, n_valid)


def _device_key_table(scene: Scene, pairs):
    """[N, K, 2] device-resident padded keypoint table for the images in
    `pairs` + image→row map.  Verification at scale is HOST-UPLOAD bound
    without it: per-batch [B, pad, 2] coordinate stacks re-upload every
    image's keys once per observing pair (measured ~46 s of the 256-image
    race's verify stage); the table uploads each image once and the
    per-batch payload shrinks to int32 match indices."""
    dt = np.float32 if scene.config.ba_dtype == "float32" else np.float64
    imgs = sorted({i for p in pairs for i in p})
    K = _round_up(max((len(scene.key_xy[i]) for i in imgs), default=1), 64)
    tab = np.zeros((len(imgs), K, 2), dt)
    for li, i in enumerate(imgs):
        k = scene.key_xy[i]
        tab[li, :len(k)] = k
    return jnp.asarray(tab), {i: li for li, i in enumerate(imgs)}


def _batch_pair_indices(scene: Scene, pairs, pad: int, local, batch: int):
    """Per-batch match-index payload (int32) for the device-side gather."""
    pi = np.zeros(batch, np.int32)
    pj = np.zeros(batch, np.int32)
    midx = np.zeros((batch, pad, 2), np.int32)
    n = np.zeros(batch, np.int32)
    for b, (i, j) in enumerate(pairs):
        m = scene.matches[(i, j)]
        cnt = min(len(m), pad)
        midx[b, :cnt] = m[:cnt]
        pi[b] = local[i]
        pj[b] = local[j]
        n[b] = cnt
    return (jnp.asarray(pi), jnp.asarray(pj), jnp.asarray(midx),
            jnp.asarray(n))


@functools.partial(jax.jit, static_argnames=("num_rounds",))
def _fmatrix_batch_idx(keys, table, pi, pj, midx, n_valid, threshold,
                       num_rounds):
    """F-RANSAC batch with the pair coordinates gathered ON DEVICE from the
    resident key table — numerically identical to `_fmatrix_batch` on
    host-stacked coords (same values, same dtype)."""
    x1 = jnp.take_along_axis(table[pi], midx[:, :, 0:1], axis=1)
    x2 = jnp.take_along_axis(table[pj], midx[:, :, 1:2], axis=1)
    return _fmatrix_batch(keys, x1, x2, n_valid, threshold, num_rounds)


@functools.partial(jax.jit, static_argnames=("num_rounds",))
def _homography_batch_idx(keys, table, pi, pj, midx, n_valid, threshold,
                          num_rounds):
    x1 = jnp.take_along_axis(table[pi], midx[:, :, 0:1], axis=1)
    x2 = jnp.take_along_axis(table[pj], midx[:, :, 1:2], axis=1)
    return _homography_batch(keys, x1, x2, n_valid, threshold, num_rounds)


def remove_border_matches(scene: Scene) -> None:
    """Drop matches whose keypoints fall within `keypoint_border_width` px
    of any edge, or within `keypoint_border_bottom` px of the bottom
    (centered coords; `RemoveMatchesNearBorder`,
    `src/BundlerGeometry.cpp:752-845`)."""
    cfg = scene.config
    bw = cfg.keypoint_border_width
    bb = cfg.keypoint_border_bottom

    def ok(img, keys):
        w, h = scene.dims[img]
        xy = scene.key_xy[img][keys]
        good = np.ones(len(keys), dtype=bool)
        if bw > 0:
            good &= (xy[:, 0] >= -0.5 * w + bw) & (xy[:, 0] <= 0.5 * w - bw)
            good &= (xy[:, 1] >= -0.5 * h + bw) & (xy[:, 1] <= 0.5 * h - bw)
        if bb > 0:
            good &= xy[:, 1] >= -0.5 * h + bb   # bottom = most-negative y
        return good

    for (i, j), m in list(scene.matches.items()):
        keep = ok(i, m[:, 0]) & ok(j, m[:, 1])
        scene.matches[(i, j)] = m[keep]


def _auto_batch(num_pairs: int, batch, pad: int = 0,
                rounds: int = 2048) -> int:
    """Pairs per dispatch.  Small collections stay on the small compiled
    shape; big pair lists jump to 128 then 256/dispatch — at 32,640 pairs
    (256 images) the 128-pair batching cost 510 verify dispatches whose
    per-call overhead (~80 ms RTT on a remote-TPU link) was over a third
    of the bundle stage.  The batch is then CAPPED by the RANSAC score
    tile's memory: the [B, pad, rounds, 3] epipolar-residual temporaries
    cost ~28·B·pad·rounds bytes, and at 128-image match densities
    (pad ≈ 1856) a 256-pair batch is a 27 GB program — past HBM
    (measured OOM, round 5)."""
    if batch is not None:
        return batch
    if num_pairs <= 64:
        return 16
    b = 128 if num_pairs <= 4096 else 256
    if pad:
        cap = max(16, int(8e9 / (28.0 * pad * max(rounds, 1))))
        p = 16
        while p * 2 <= cap:
            p *= 2
        b = min(b, p)
    return b


def compute_epipolar_geometry(scene: Scene, seed: int = 0,
                              batch: int = None) -> None:
    """F-RANSAC every matched pair; filter match lists to inliers; drop pairs
    with < min_num_feat_matches inliers (`ComputeEpipolarGeometry`,
    `src/BundlerGeometry.cpp:330-439`; removeBadMatches=True on this path,
    `:142`)."""
    cfg = scene.config
    pairs = sorted(scene.matches.keys())
    if not pairs:
        return
    # Reference requires >= 20 matches to even try (src/Epipolar.cpp:127).
    todo = [p for p in pairs if len(scene.matches[p]) >= 20]
    drop = [p for p in pairs if len(scene.matches[p]) < 20]
    pad_all = _round_up(max((len(scene.matches[p]) for p in todo),
                            default=8), 64)
    batch = _auto_batch(len(todo), batch, pad=pad_all,
                        rounds=cfg.fmatrix_rounds)
    base_key = jax.random.PRNGKey(seed)
    table, local = _device_key_table(scene, todo) if todo else (None, None)
    thr = jnp.asarray(cfg.fmatrix_threshold,
                      table.dtype if todo else np.float64)

    def consume(chunk, out):
        F, inl, cnt = (np.asarray(o) for o in out)
        for b, (i, j) in enumerate(chunk):
            m = scene.matches[(i, j)]
            keep = inl[b, :len(m)]
            kept = m[keep]
            if int(cnt[b]) >= cfg.min_num_feat_matches:
                scene.matches[(i, j)] = kept
                ti = scene.transforms.setdefault((i, j), TransformInfo())
                ti.fmatrix = F[b]
                tj = scene.transforms.setdefault((j, i), TransformInfo())
                tj.fmatrix = F[b].T
            else:
                drop.append((i, j))

    # One-batch-behind consumption: batch k's result fetch overlaps batch
    # k+1's upload + device execution (the fetch is the only sync point).
    pending = None
    for start in range(0, len(todo), batch):
        chunk = todo[start:start + batch]
        pi, pj, midx, n = _batch_pair_indices(scene, chunk, pad_all,
                                              local, batch)
        keys = jax.random.split(jax.random.fold_in(base_key, start), batch)
        counter("dispatches")
        out = _fmatrix_batch_idx(keys, table, pi, pj, midx, n, thr,
                                 cfg.fmatrix_rounds)
        if pending is not None:
            consume(*pending)
        pending = (chunk, out)
    if pending is not None:
        consume(*pending)
    for p in drop:
        scene.matches.pop(p, None)
        scene.transforms.pop(p, None)
        scene.transforms.pop((p[1], p[0]), None)


def compute_transforms(scene: Scene, seed: int = 1, batch: int = None
                       ) -> None:
    """Homography per surviving pair; records inlier count/ratio for initial
    -pair scoring (`ComputeTransform`, `src/BundlerGeometry.cpp:197-263`;
    called with removeBadMatches=false, `:146`; MIN_INLIERS=10)."""
    cfg = scene.config
    pairs = sorted(scene.matches.keys())
    # The reference default-constructs a TransformInfo for EVERY matched
    # pair before attempting the fit (BundlerGeometry.cpp:283-284), so pairs
    # whose homography fails still appear (ratio 0) in pairwise_scores.txt.
    for (i, j) in pairs:
        if i < j:
            scene.transforms.setdefault((i, j), TransformInfo())
            scene.transforms.setdefault((j, i), TransformInfo())
    todo = [p for p in pairs if len(scene.matches[p]) >= 4]
    if not todo:
        return
    pad_all = _round_up(max(len(scene.matches[p]) for p in todo), 64)
    batch = _auto_batch(len(todo), batch, pad=pad_all,
                        rounds=cfg.homography_rounds)
    base_key = jax.random.PRNGKey(seed + 7777)
    table, local = _device_key_table(scene, todo)
    thr = jnp.asarray(cfg.homography_threshold, table.dtype)

    def consume(chunk, out):
        H, _inl, cnt = out
        H = np.asarray(H)
        cnt = np.asarray(cnt)
        for b, (i, j) in enumerate(chunk):
            m = scene.matches[(i, j)]
            num_inl = int(cnt[b])
            if num_inl >= 10:
                ti = scene.transforms.setdefault((i, j), TransformInfo())
                ti.hmatrix = H[b]
                ti.num_inliers = num_inl
                ti.inlier_ratio = num_inl / max(len(m), 1)

    pending = None
    for start in range(0, len(todo), batch):
        chunk = todo[start:start + batch]
        pi, pj, midx, n = _batch_pair_indices(scene, chunk, pad_all,
                                              local, batch)
        keys = jax.random.split(jax.random.fold_in(base_key, start), batch)
        counter("dispatches")
        out = _homography_batch_idx(keys, table, pi, pj, midx, n, thr,
                                    cfg.homography_rounds)
        if pending is not None:
            consume(*pending)
        pending = (chunk, out)
    if pending is not None:
        consume(*pending)


def compute_geometric_constraints(scene: Scene, seed: int = 0,
                                  cache_path=None,
                                  overwrite: bool = False,
                                  snapshot_dir=None,
                                  scores_path=None) -> None:
    """The full verification stage (`ComputeGeometricConstraints`,
    `src/BundlerGeometry.cpp:99-194`): F filter → H score → symmetric lists
    → tracks → per-image track tables.

    With `cache_path` set, behaves like the reference's constraints.txt
    checkpoint (`:105-108`): load it if present (unless overwrite), write it
    after computing.  With `snapshot_dir` set, dumps the match table at the
    .prune / .ransac / .corresp stages like the reference
    (`WriteMatchTable`, `src/BundlerGeometry.cpp:113,152,188`)."""
    import os
    from bundler_sfm_tpu.io.constraints import (
        read_geometric_constraints, write_geometric_constraints,
    )
    from bundler_sfm_tpu.io.matchfile import write_match_table
    from bundler_sfm_tpu.utils import counter, get_telemetry
    if cache_path and not overwrite and os.path.exists(cache_path):
        read_geometric_constraints(cache_path, scene)
        return
    cfg = scene.config
    counter("pairs_verified", len(scene.matches))
    _t0 = time.perf_counter()
    if snapshot_dir is not None:
        write_match_table(scene.num_images, scene.matches, ".prune",
                          snapshot_dir)
    # Border-match filters (`RemoveMatchesNearBorder`/`...NearBottom`,
    # `src/BundlerGeometry.cpp:119-139, 752-845`).
    if cfg.keypoint_border_width > 0 or cfg.keypoint_border_bottom > 0:
        remove_border_matches(scene)
    from bundler_sfm_tpu.utils import stage
    if not cfg.skip_fmatrix:
        with stage("verify_fmatrix"):
            compute_epipolar_geometry(scene, seed=seed)
    if not cfg.skip_homographies:
        with stage("verify_homography"):
            compute_transforms(scene, seed=seed)
    if scores_path is not None:
        # The reference emits pairwise_scores.txt at the end of every
        # ComputeTransforms run (`src/BundlerGeometry.cpp:309-326`).
        from bundler_sfm_tpu.io.constraints import write_pairwise_scores
        write_pairwise_scores(scores_path, scene)
    if snapshot_dir is not None:
        write_match_table(scene.num_images, scene.matches, ".ransac",
                          snapshot_dir)
    with stage("verify_tracks"):
        scene.matches = symmetrize(scene.matches)
        try:
            from bundler_sfm_tpu import native
            tracks = native.build_tracks_native(scene.matches,
                                                scene.num_images)
        except Exception:
            tracks = None
        scene.tracks = tracks if tracks is not None else \
            build_tracks(scene.matches, scene.num_images)
        # Filter track length like the reference's min/max_track_views gates.
        scene.tracks = [t for t in scene.tracks
                        if cfg.min_track_views <= len(t) <= cfg.max_track_views]
        vp, vk, kt = tracks_to_image_tables(scene.tracks, scene.num_images)
    scene.visible_points = vp
    scene.visible_keys = vk
    scene.key_track = kt
    # Reference clears raw match lists after track building
    # (`RemoveAllMatches`, BundlerGeometry.cpp:158) — tracks are the truth now.
    scene.matches = {}
    get_telemetry().add_time("verify", time.perf_counter() - _t0)
    if cache_path:
        write_geometric_constraints(cache_path, scene)
    if snapshot_dir is not None:
        # .corresp: the covisibility pair set derived from tracks, with the
        # match lists cleared — exactly the state the reference snapshots
        # after RemoveAllMatches + SetMatch flags (BundlerGeometry.cpp:160-188).
        covis = {}
        empty = np.zeros((0, 2), np.int32)
        for t in scene.tracks:
            views = sorted(img for img, _ in t)
            for a in range(len(views)):
                for b in range(a + 1, len(views)):
                    covis[(views[a], views[b])] = empty
        write_match_table(scene.num_images, covis, ".corresp", snapshot_dir)
