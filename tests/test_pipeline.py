import numpy as np
import pytest

from tests.synthetic import Scene as SynScene, project

from bundler_sfm_tpu.config import BundlerConfig, default_pipeline_config
from bundler_sfm_tpu.io.listfile import ImageEntry
from bundler_sfm_tpu.pipeline.scene import Scene
from bundler_sfm_tpu.pipeline.tracks import (
    build_tracks, matches_from_tracks, tracks_to_image_tables,
)
from bundler_sfm_tpu.pipeline.verify import compute_geometric_constraints
from bundler_sfm_tpu.pipeline.incremental import bundle_adjust_fast
from bundler_sfm_tpu.ops.matching import symmetrize


def test_build_tracks_basic():
    # Images 0-1-2 chained: key 5 in 0 <-> key 7 in 1 <-> key 9 in 2.
    matches = {
        (0, 1): np.array([[5, 7], [6, 8]], dtype=np.int32),
        (1, 2): np.array([[7, 9]], dtype=np.int32),
    }
    matches = symmetrize(matches)
    tracks = build_tracks(matches, 3)
    tracks_sorted = sorted(tracks, key=len, reverse=True)
    assert sorted(tracks_sorted[0]) == [(0, 5), (1, 7), (2, 9)]
    assert sorted(tracks_sorted[1]) == [(0, 6), (1, 8)]


def test_build_tracks_one_key_per_image():
    # A track that would revisit image 0 through a cycle keeps only the
    # first image-0 key (img_marked rule, ComputeTracks.cpp:171).
    matches = {
        (0, 1): np.array([[1, 1]], dtype=np.int32),
        (1, 0): np.array([[1, 1], [2, 3]], dtype=np.int32),
        (1, 2): np.array([[1, 1]], dtype=np.int32),
        (2, 0): np.array([[1, 3]], dtype=np.int32),
        (0, 2): np.array([[3, 1]], dtype=np.int32),
    }
    tracks = build_tracks(matches, 3)
    for t in tracks:
        imgs = [i for i, _ in t]
        assert len(imgs) == len(set(imgs))


def test_matches_from_tracks():
    tracks = [[(0, 5), (1, 7), (2, 9)], [(0, 6), (2, 8)]]
    m = matches_from_tracks(tracks, 0, 2)
    assert sorted(map(tuple, m)) == [(5, 9), (6, 8)]
    vp, vk, kt = tracks_to_image_tables(tracks, 3)
    assert vp[0] == [0, 1]
    assert vk[0] == [5, 6]
    assert kt[2][9] == 0 and kt[2][8] == 1


def make_pipeline_scene(rng, num_cams=6, num_pts=250, f=700.0,
                        outlier_frac=0.05, noise=0.3, seed_cfg=None):
    """Synthetic multi-view scene shaped like real pipeline input: per-image
    keys are a permutation of point observations plus distractor keys."""
    syn = SynScene(rng, num_cams=num_cams, num_pts=num_pts, f=f, noise=noise)
    W, H = 1024, 768
    key_xy = []
    keymap = []  # per image: point idx -> key idx
    for c in range(num_cams):
        xy = syn.obs[c]
        # Keep only points inside the frame.
        inside = (np.abs(xy[:, 0]) < W / 2 - 4) & (np.abs(xy[:, 1]) < H / 2 - 4)
        n_extra = 40
        extra = rng.uniform(-300, 300, (n_extra, 2))
        coords = np.concatenate([xy, extra])
        perm = rng.permutation(len(coords))
        inv = np.argsort(perm)
        key_xy.append(coords[perm])
        keymap.append({p: int(inv[p]) for p in range(num_pts) if inside[p]})
    matches = {}
    for i in range(num_cams):
        for j in range(i + 1, num_cams):
            shared = [p for p in keymap[i] if p in keymap[j]]
            m = np.array([[keymap[i][p], keymap[j][p]] for p in shared],
                         dtype=np.int32)
            # Inject outlier matches.
            n_bad = int(len(m) * outlier_frac)
            if n_bad:
                bad = np.stack([
                    rng.integers(0, len(key_xy[i]), n_bad),
                    rng.integers(0, len(key_xy[j]), n_bad)], axis=1
                ).astype(np.int32)
                m = np.concatenate([m, bad])
            matches[(i, j)] = m
    cfg = seed_cfg or default_pipeline_config(
        fmatrix_rounds=512, homography_rounds=128, projection_rounds=1024,
        sfm_max_iters=60)
    entries = [ImageEntry(f"img{c}.jpg", init_focal=f) for c in range(num_cams)]
    scene = Scene(config=cfg, entries=entries,
                  dims=[(W, H)] * num_cams, key_xy=key_xy, matches=matches)
    return scene, syn


def similarity_align(A, B):
    """Horn alignment B ≈ s R A + t; returns residual rms."""
    muA, muB = A.mean(0), B.mean(0)
    A0, B0 = A - muA, B - muB
    U, S, Vt = np.linalg.svd(B0.T @ A0)
    D = np.eye(3)
    D[2, 2] = np.sign(np.linalg.det(U @ Vt))
    R = U @ D @ Vt
    s = (S * np.diag(D)).sum() / (A0 ** 2).sum()
    res = B0 - s * A0 @ R.T
    return np.sqrt((res ** 2).sum(1).mean()) / max(
        np.sqrt((B0 ** 2).sum(1).mean()), 1e-12)


@pytest.mark.slow
def test_end_to_end_synthetic(rng, tmp_path):
    scene, syn = make_pipeline_scene(rng)
    compute_geometric_constraints(scene, seed=3)
    assert len(scene.tracks) > 150
    recon = bundle_adjust_fast(scene, out_dir=str(tmp_path), seed=5)
    # All cameras registered.
    assert recon.num_cameras == 6
    n_pts = sum(1 for v in recon.pt_views if v)
    assert n_pts > 120
    # Camera centers match ground truth up to similarity.
    est = np.stack([recon.cam_params[s][0:3] for s in range(6)])
    gt = np.stack([syn.centers[i] for i in recon.added_order])
    rel = similarity_align(est, gt)
    assert rel < 0.02, f"relative center error {rel}"
    # Focals recovered.
    for s in range(6):
        assert recon.cam_params[s][6] == pytest.approx(700.0, rel=0.05)
    # Output files written.
    assert (tmp_path / "bundle.out").exists()
    from bundler_sfm_tpu.io import read_bundle_file
    bf = read_bundle_file(str(tmp_path / "bundle.out"))
    assert bf.num_registered == 6
    assert len(bf.points) == n_pts


def test_tracks_and_matches_from_points():
    from bundler_sfm_tpu.pipeline.tracks import (
        matches_from_points, tracks_from_points,
    )
    point_views = [
        [(0, 3), (1, 7), (2, 1)],
        [(0, 4), (2, 9)],
    ]
    tracks, vp, vk, kt = tracks_from_points(point_views, 3)
    assert len(tracks) == 2
    assert vp[0] == [0, 1] and vk[0] == [3, 4]
    assert kt[2] == {1: 0, 9: 1}
    m = matches_from_points(point_views)
    assert np.array_equal(m[(0, 2)], np.array([[3, 1], [4, 9]]))
    assert np.array_equal(m[(2, 0)], np.array([[1, 3], [9, 4]]))
    assert np.array_equal(m[(1, 2)], np.array([[7, 1]]))
    # threshold drops 2-view points.
    m3 = matches_from_points(point_views, threshold=3)
    assert (0, 2) in m3 and len(m3[(0, 2)]) == 1


def test_find_camera_with_most_connectivity(rng, tmp_path):
    import dataclasses
    from bundler_sfm_tpu.pipeline.incremental import (
        bundle_adjust_slow, find_camera_with_most_connectivity,
    )
    scene, syn = make_pipeline_scene(rng)
    scene = dataclasses.replace(scene, config=dataclasses.replace(
        scene.config, construct_max_connectivity=True))
    compute_geometric_constraints(scene, seed=3)
    recon = bundle_adjust_slow(scene, out_dir=str(tmp_path), seed=5)
    assert recon.num_cameras == 6
    # After full registration no candidate remains.
    img, n = find_camera_with_most_connectivity(recon, scene)
    assert img == -1


def test_fix_necker_reversal(rng):
    """--fix_necker (src/BundleFast.cpp:126-214): swap the initial pair,
    re-triangulate, re-bundle; the reversed configuration must re-converge
    to a consistent two-camera model on clean data."""
    import dataclasses
    from bundler_sfm_tpu.pipeline.incremental import (
        fix_necker_reversal, pick_initial_pair, run_sfm, setup_initial_pair,
    )
    from bundler_sfm_tpu.ops.projection import project_obs
    import jax.numpy as jnp

    scene, syn = make_pipeline_scene(rng, num_cams=4, num_pts=150,
                                     outlier_frac=0.0)
    scene = dataclasses.replace(scene, config=dataclasses.replace(
        scene.config, fix_necker=True))
    compute_geometric_constraints(scene, seed=3)
    i, j = pick_initial_pair(scene, True)
    recon = setup_initial_pair(scene, i, j, seed=5)
    run_sfm(recon, scene, remove_outliers=False)
    pts_before = np.stack(recon.points)
    # Corrupt the model into the Necker-reversed state (swapped poses);
    # the fix swaps back, re-triangulates, and re-bundles to the true
    # configuration.
    recon.cam_R[0], recon.cam_R[1] = recon.cam_R[1], recon.cam_R[0]
    p0 = np.array(recon.cam_params[0])
    p1 = np.array(recon.cam_params[1])
    p0[0:3], p1[0:3] = p1[0:3].copy(), p0[0:3].copy()
    recon.cam_params[0], recon.cam_params[1] = p0, p1
    fix_necker_reversal(recon, scene)
    assert recon.num_cameras == 2
    assert len(recon.points) == len(pts_before)
    # Re-bundled reversed configuration reprojects well.
    obs_cam, obs_pt, obs_xy = [], [], []
    for p, views in enumerate(recon.pt_views):
        for (slot, key) in views:
            img = recon.added_order[slot]
            obs_cam.append(slot)
            obs_pt.append(p)
            obs_xy.append(scene.key_xy[img][key])
    pred = np.asarray(project_obs(
        jnp.asarray(np.stack(recon.cam_params)),
        jnp.asarray(np.stack(recon.cam_R)),
        jnp.asarray(np.stack(recon.points)),
        jnp.asarray(np.array(obs_cam, np.int32)),
        jnp.asarray(np.array(obs_pt, np.int32))))
    err = np.linalg.norm(pred - np.array(obs_xy), axis=1)
    assert np.median(err) < 1.0


def test_observability_outputs(rng, tmp_path, capsys):
    """pairwise_scores.txt (`src/BundlerGeometry.cpp:309-326`) and the
    per-camera 10-bin error histograms (`src/Bundle.cpp:823-846`) are
    emitted during a run, in the reference's formats."""
    import re
    from bundler_sfm_tpu.pipeline.incremental import (
        pick_initial_pair, run_sfm, setup_initial_pair,
    )
    scene, syn = make_pipeline_scene(
        rng, num_cams=3, num_pts=120,
        seed_cfg=default_pipeline_config(
            fmatrix_rounds=256, homography_rounds=64, projection_rounds=256,
            sfm_max_iters=30))
    scores = tmp_path / "pairwise_scores.txt"
    compute_geometric_constraints(scene, seed=3, scores_path=str(scores))
    assert scores.exists()
    lines = scores.read_text().splitlines()
    assert lines, "no pairwise scores written"
    for ln in lines:
        m = re.fullmatch(r"(\d+) (\d+) (\d\.\d{5})", ln)
        assert m, f"bad pairwise_scores line: {ln!r}"
        assert int(m.group(1)) < int(m.group(2))
        assert 0.0 <= float(m.group(3)) <= 1.0

    i, j = pick_initial_pair(scene, True)
    recon = setup_initial_pair(scene, i, j, seed=5)
    run_sfm(recon, scene, remove_outliers=False)
    out = capsys.readouterr().out
    hist = [ln for ln in out.splitlines() if ln.startswith("   E[")]
    # 10 bins per camera per round, 2 cameras, >= 1 round.
    assert len(hist) >= 20
    for ln in hist[:10]:
        assert re.fullmatch(
            r"   E\[-?\d\.\d{3}e[+-]\d+---?\d\.\d{3}e[+-]\d+\]: \d+ "
            r"\[\d\.\d{3}\]", ln), f"bad histogram line: {ln!r}"
    # Bin fractions for one camera sum to ~1.
    fracs = [float(ln.split("[")[2].rstrip("]")) for ln in hist[:10]]
    assert abs(sum(fracs) - 1.0) < 0.01


def test_dispatch_count_collapsed(rng, tmp_path):
    """The fused-loop driver keeps a small reconstruction to a handful of
    device dispatches (round-1 ran ~500 per reconstruction; the telemetry
    counter guards the collapse)."""
    from bundler_sfm_tpu.utils import get_telemetry
    scene, syn = make_pipeline_scene(
        rng, num_cams=4, num_pts=150,
        seed_cfg=default_pipeline_config(
            fmatrix_rounds=256, homography_rounds=64, projection_rounds=256,
            sfm_max_iters=30))
    get_telemetry().reset()
    compute_geometric_constraints(scene, seed=3)
    recon = bundle_adjust_fast(scene, seed=5)
    assert recon.num_cameras == 4
    n = get_telemetry().counters.get("dispatches", 0)
    assert 0 < n <= 30, f"dispatches per reconstruction: {n}"


def test_pipeline_chunked_ba_threshold_equivalence(rng):
    """run_sfm's runner selection (incremental.py est_work vs
    _FUSED_WORK_BUDGET): forcing the budget down routes the SAME scene
    through run_ba_outlier_loop_chunked and must produce the same
    reconstruction as the fused one-dispatch loop."""
    import copy
    import bundler_sfm_tpu.ops.ba as ba
    scene, syn = make_pipeline_scene(
        rng, num_cams=4, num_pts=150,
        seed_cfg=default_pipeline_config(
            fmatrix_rounds=256, homography_rounds=64, projection_rounds=256,
            sfm_max_iters=30))
    scene2 = copy.deepcopy(scene)
    compute_geometric_constraints(scene, seed=3)
    recon_a = bundle_adjust_fast(scene, seed=5)
    old = ba._FUSED_WORK_BUDGET
    try:
        ba._FUSED_WORK_BUDGET = 1.0
        compute_geometric_constraints(scene2, seed=3)
        recon_b = bundle_adjust_fast(scene2, seed=5)
    finally:
        ba._FUSED_WORK_BUDGET = old
    assert recon_a.num_cameras == recon_b.num_cameras
    assert recon_a.added_order == recon_b.added_order
    # Not bitwise: XLA compiles the resumable chunks as separate programs
    # and may reassociate f64 reductions differently — only compiled-program
    # -level noise (~1e-9) is tolerated, not algorithmic divergence.
    for s in range(recon_a.num_cameras):
        np.testing.assert_allclose(recon_a.cam_params[s],
                                   recon_b.cam_params[s],
                                   rtol=1e-4, atol=1e-6)
    live_a = [p for p in range(len(recon_a.pt_views)) if recon_a.pt_views[p]]
    live_b = [p for p in range(len(recon_b.pt_views)) if recon_b.pt_views[p]]
    assert live_a == live_b


def test_cap_slot_views_guard(rng):
    """_cap_slot_views bounds the slot-layout view dimension: long tracks
    are evenly subsampled only when padding waste exceeds the factor, and
    small/dense problems pass through untouched (ADVICE r2)."""
    from bundler_sfm_tpu.pipeline.incremental import _cap_slot_views
    # Dense small problem: no-op.
    obs_pt = np.repeat(np.arange(50, dtype=np.int32), 4)
    obs_cam = np.tile(np.arange(4, dtype=np.int32), 50)
    obs_xy = rng.normal(size=(200, 2))
    c, p, x = _cap_slot_views(obs_cam, obs_pt, obs_xy, 50)
    assert len(p) == 200
    # Pathological: one 512-view track over 4000 sparse points (2 views
    # each) -> waste (4000*512)/(8000+512) = 240x; guard must cap.
    n_pts = 4000
    obs_pt = np.concatenate([
        np.zeros(512, np.int32),
        np.repeat(np.arange(1, n_pts, dtype=np.int32), 2)])
    O = len(obs_pt)
    obs_cam = (np.arange(O) % 512).astype(np.int32)
    obs_xy = rng.normal(size=(O, 2))
    c, p, x = _cap_slot_views(obs_cam, obs_pt, obs_xy, n_pts)
    counts = np.bincount(p, minlength=n_pts)
    M = counts.max()
    assert M < 512 and M >= 32
    # Waste bound, floored by min_cap=32 (+ bucketing slack).
    assert n_pts * M <= max(4.0 * O, n_pts * 32) + n_pts * 4
    # Short tracks untouched.
    assert (counts[1:] == 2).all()
    # The capped track's survivors are evenly spread (first and last kept).
    kept = np.nonzero(p == 0)[0]   # point 0's obs were input rows 0..511
    assert counts[0] == M
    gaps = np.diff(kept)
    assert gaps.max() <= int(np.ceil(512 / M)) + 1


def test_panorama_mode_points_at_infinity(rng):
    """Panorama mode e2e slice (src/BundleAdd.cpp:129-176, 342-348 +
    config --panorama_mode): a rotation-only pair places new tracks on
    their first view's UNIT ray (GeneratePointAtInfinity), gated by the
    real reprojection residual, and a panorama BA round stays finite."""
    from bundler_sfm_tpu.pipeline.incremental import (
        Reconstruction, add_all_new_points, run_sfm,
    )
    f = 700.0
    W, H = 1024, 768
    center = np.array([0.0, 0.0, 0.0])
    # Two rotations 15 degrees apart about y.
    def yaw(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    Rs = [yaw(0.0), yaw(np.radians(15.0))]
    pts = rng.uniform(-1, 1, (200, 3))
    pts[:, 2] -= 4.0           # cloud in front (-z)
    pts *= 50.0                # far away (panorama-like)
    key_xy, keymap = [], []
    for R in Rs:
        p = (pts - center) @ R.T
        uv = -f * p[:, :2] / p[:, 2:3]
        vis = (np.abs(uv[:, 0]) < W / 2 - 4) & (np.abs(uv[:, 1]) < H / 2 - 4) \
            & (p[:, 2] < 0)
        key_xy.append(uv[vis] + rng.normal(size=(vis.sum(), 2)) * 0.2)
        keymap.append({int(p_): k for k, p_ in enumerate(np.nonzero(vis)[0])})
    shared = [p for p in keymap[0] if p in keymap[1]]
    assert len(shared) > 60
    m = np.array([[keymap[0][p], keymap[1][p]] for p in shared], np.int32)
    cfg = default_pipeline_config(fmatrix_rounds=256, homography_rounds=64,
                                  sfm_max_iters=20)
    cfg.panorama_mode = True
    cfg.ray_angle_threshold = 0.0
    entries = [ImageEntry(f"pan{i}.jpg", init_focal=f) for i in range(2)]
    scene = Scene(config=cfg, entries=entries, dims=[(W, H)] * 2,
                  key_xy=key_xy, matches={(0, 1): m})
    compute_geometric_constraints(scene, seed=1)
    assert len(scene.tracks) > 50
    recon = Reconstruction(
        added_order=[0, 1],
        cam_R=[R.copy() for R in Rs],
        cam_params=[np.concatenate([center, [0, 0, 0], [f], [0, 0]])
                    for _ in range(2)],
        points=[], colors=[], pt_views=[],
        track_extra=np.full(len(scene.tracks), -1, np.int64),
        key_extra=[{} for _ in range(2)])
    n = add_all_new_points(recon, scene)
    assert n > 40, f"panorama points added: {n}"
    # GeneratePointAtInfinity: unit distance from the (shared) center.
    d = np.linalg.norm(np.stack(recon.points) - center, axis=1)
    np.testing.assert_allclose(d, 1.0, atol=1e-9)
    # A panorama BA round must stay finite (rotation-only geometry).
    avg = run_sfm(recon, scene, remove_outliers=False, verbose=False)
    assert np.isfinite(avg)


def test_run_sfm_windowed_planner_bookkeeping(rng):
    """Force plan_schur_windows to activate on a small scene and check the
    production row_of remap bookkeeping (pts/removed mapped back through
    the permutation) gives the same reconstruction as the full path."""
    import copy
    import functools
    import bundler_sfm_tpu.ops.ba as ba
    import bundler_sfm_tpu.pipeline.incremental as inc
    scene, syn = make_pipeline_scene(
        rng, num_cams=5, num_pts=200,
        seed_cfg=default_pipeline_config(
            fmatrix_rounds=256, homography_rounds=64, projection_rounds=256,
            sfm_max_iters=30))
    scene2 = copy.deepcopy(scene)
    compute_geometric_constraints(scene, seed=3)
    recon_a = bundle_adjust_fast(scene, seed=5)
    orig = ba.plan_schur_windows
    calls = []

    def forced(oc, op, npts, ncams, mv, **kw):
        # A full-overlap scene has no narrow spans, so fabricate a plan
        # that still exercises ALL of run_sfm's remap bookkeeping: a
        # nontrivial point-row permutation with dummy padding rows.
        # window == ncams disables the windowed kernels inside BA
        # (window < C gates), isolating the host-side permutation logic.
        calls.append(True)
        total = npts + 7
        row_of = np.random.default_rng(0).permutation(total)[:npts] \
            .astype(np.int32)
        return row_of, np.zeros(1, np.int32), int(ncams), 1, total

    inc.plan_schur_windows = None  # ensure the import inside run_sfm is used
    try:
        ba.plan_schur_windows = forced
        compute_geometric_constraints(scene2, seed=3)
        recon_b = bundle_adjust_fast(scene2, seed=5)
    finally:
        ba.plan_schur_windows = orig
        del inc.plan_schur_windows
    assert any(calls), "forced planner never produced a plan"
    assert recon_a.added_order == recon_b.added_order
    # Point-order permutation reassociates f64 reductions; a converged
    # pipeline shows ~1e-4 drift in near-gauge directions.  A bookkeeping
    # bug (wrong row mapping) would scramble points outright — the live
    # set and per-point positions are the real check.
    for s in range(recon_a.num_cameras):
        np.testing.assert_allclose(recon_a.cam_params[s],
                                   recon_b.cam_params[s],
                                   rtol=1e-3, atol=5e-4)
    live_a = [p for p in range(len(recon_a.pt_views)) if recon_a.pt_views[p]]
    live_b = [p for p in range(len(recon_b.pt_views)) if recon_b.pt_views[p]]
    assert live_a == live_b
    for p in live_a:
        np.testing.assert_allclose(recon_a.points[p], recon_b.points[p],
                                   rtol=1e-2, atol=1e-3)


def test_pick_initial_pair_matches_bruteforce(rng):
    """The sparse-matmul shared-track scoring reproduces the reference rule
    (BundlePickInitialPair, src/Bundle.cpp:1578-1701) bit-for-bit against a
    direct set-intersection evaluation, including tie order."""
    from bundler_sfm_tpu.pipeline.verify import compute_geometric_constraints
    from bundler_sfm_tpu.pipeline.incremental import pick_initial_pair
    scene, syn = make_pipeline_scene(rng, num_cams=7, num_pts=260)
    compute_geometric_constraints(scene, seed=11)

    def brute(scene, use_init_focal_only):
        cfg = scene.config
        n = scene.num_images
        SCORE_THRESHOLD = 2.0
        MATCH_THRESHOLD, MIN_SCORE, MIN_MATCHES = 32, 1.0e-1, 80
        best = (-1, -1, 0, 0.0)
        best2 = (-1, -1, 0, 0.0)
        track_sets = [set(vp) for vp in scene.visible_points]
        for i in range(n):
            if scene.ignore_in_bundle[i]:
                continue
            if use_init_focal_only and cfg.use_focal_estimate \
                    and not scene.has_init_focal(i):
                continue
            for j in range(i + 1, n):
                if scene.ignore_in_bundle[j]:
                    continue
                if use_init_focal_only and cfg.use_focal_estimate \
                        and not scene.has_init_focal(j):
                    continue
                nm = len(track_sets[i] & track_sets[j])
                if nm <= MATCH_THRESHOLD:
                    continue
                ti = scene.transforms.get((i, j))
                ratio = ti.inlier_ratio if ti else 0.0
                score = MIN_SCORE if ratio == 0.0 else 1.0 / ratio
                if nm > best[2] and score > SCORE_THRESHOLD:
                    best = (i, j, nm, score)
                if nm > MIN_MATCHES and score > best2[3]:
                    best2 = (i, j, nm, score)
        if best[0] != -1:
            return best[0], best[1]
        if best2[0] != -1:
            return best2[0], best2[1]
        return (0, 1)
    assert pick_initial_pair(scene, True) == brute(scene, True)
    assert pick_initial_pair(scene, False) == brute(scene, False)
    # An ignored image must be excluded.
    scene.ignore_in_bundle[brute(scene, False)[0]] = True
    assert pick_initial_pair(scene, False) == brute(scene, False)


def test_auto_batch_memory_cap():
    """The verify pair batch must shrink when the RANSAC score tile would
    exceed the memory budget (128-image density OOM'd at the fixed 256),
    and stay at the dispatch-amortizing sizes for small tiles."""
    from bundler_sfm_tpu.pipeline.verify import _auto_batch
    assert _auto_batch(40, None) == 16
    assert _auto_batch(3000, None, pad=512, rounds=2048) == 128
    assert _auto_batch(40000, None, pad=512, rounds=2048) == 256
    big = _auto_batch(8000, None, pad=1856, rounds=2048)
    assert big < 128 and 28.0 * big * 1856 * 2048 <= 8e9
    assert _auto_batch(8000, 256, pad=1856, rounds=2048) == 256  # explicit
