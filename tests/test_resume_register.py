import numpy as np
import pytest

from tests.synthetic import Scene as SynScene
from tests.test_pipeline import make_pipeline_scene, similarity_align

from bundler_sfm_tpu.io.constraints import (
    read_geometric_constraints, write_geometric_constraints,
    write_pairwise_scores,
)
from bundler_sfm_tpu.pipeline.incremental import (
    bundle_adjust_fast, to_bundle_file, run_sfm,
)
from bundler_sfm_tpu.pipeline.resume import (
    continue_reconstruction, resume_from_bundle,
)
from bundler_sfm_tpu.pipeline.register import (
    coalesce_point_descriptors, register_image,
)
from bundler_sfm_tpu.pipeline.verify import compute_geometric_constraints


@pytest.mark.slow
def test_constraints_checkpoint_roundtrip(rng, tmp_path):
    scene, syn = make_pipeline_scene(rng, num_cams=4, num_pts=150)
    cache = tmp_path / "constraints.txt"
    compute_geometric_constraints(scene, seed=1, cache_path=str(cache))
    assert cache.exists()
    n_tracks = len(scene.tracks)
    n_transforms = len(scene.transforms)
    write_pairwise_scores(str(tmp_path / "pairwise_scores.txt"), scene)
    assert (tmp_path / "pairwise_scores.txt").read_text().count("\n") > 0

    # Second scene loads from the cache without recomputation.
    scene2, _ = make_pipeline_scene(np.random.default_rng(0),
                                    num_cams=4, num_pts=150)
    compute_geometric_constraints(scene2, seed=999, cache_path=str(cache))
    assert len(scene2.tracks) == n_tracks
    assert len(scene2.transforms) == n_transforms
    assert scene2.tracks == scene.tracks
    for k, t in scene.transforms.items():
        t2 = scene2.transforms[k]
        if t.fmatrix is not None:
            assert np.allclose(t.fmatrix, t2.fmatrix, rtol=1e-5)
        assert t.num_inliers == t2.num_inliers


@pytest.mark.slow
def test_resume_and_continue(rng, tmp_path):
    """Reconstruct with 2 images held out, resume from the bundle file, and
    extend to all cameras (the --bundle/--add_images path)."""
    scene, syn = make_pipeline_scene(rng, num_cams=6, num_pts=220)
    compute_geometric_constraints(scene, seed=3)
    # Hold out the last two images.
    scene.ignore_in_bundle[4] = True
    scene.ignore_in_bundle[5] = True
    recon = bundle_adjust_fast(scene, seed=5)
    assert recon.num_cameras == 4
    bundle = to_bundle_file(recon, scene)

    # Resume in a fresh scene (same tracks).
    scene2, _ = make_pipeline_scene(np.random.default_rng(0),
                                    num_cams=6, num_pts=220)
    compute_geometric_constraints(scene2, seed=3)
    recon2 = resume_from_bundle(scene2, bundle)
    assert recon2.num_cameras == 4
    err = run_sfm(recon2, scene2, remove_outliers=False, verbose=False)
    assert err < 1.5  # resumed state is consistent

    recon2 = continue_reconstruction(scene2, recon2, seed=7)
    assert recon2.num_cameras == 6
    est = np.stack([recon2.cam_params[s][0:3] for s in range(6)])
    gt = np.stack([syn.centers[i] for i in recon2.added_order])
    assert similarity_align(est, gt) < 0.02


@pytest.mark.slow
def test_register_image_against_model(rng):
    """Localize a held-out image against a model built from the others."""
    scene, syn = make_pipeline_scene(rng, num_cams=6, num_pts=220)
    # Fabricate per-key descriptors: shared per 3D point + noise, so the
    # held-out image's keys match the model's coalesced point descriptors.
    num_pts = 220
    base = rng.integers(0, 256, (num_pts, 128)).astype(np.int32)
    key_descs = []
    for c in range(6):
        n_keys = len(scene.key_xy[c])
        d = rng.integers(0, 256, (n_keys, 128)).astype(np.uint8)
        key_descs.append(d)
    # Assign the point-derived descriptor to the key that observes it.
    # Recover key index per (cam, point) from the match construction: the
    # synthetic scene's keymap is internal, so rebuild from tracks instead.
    compute_geometric_constraints(scene, seed=3)
    scene.ignore_in_bundle[5] = True
    recon = bundle_adjust_fast(scene, seed=5)
    assert recon.num_cameras == 5
    bundle = to_bundle_file(recon, scene)

    # Give every key participating in a reconstructed point a descriptor
    # derived from the point id; image 5's keys get the same (noisy).
    for p_idx, p in enumerate(bundle.points):
        for v in p.views:
            img, key = int(v[0]), int(v[1])
            key_descs[img][key] = np.clip(
                base[p_idx % num_pts] + rng.integers(-2, 3, 128), 0, 255)
    # Build image-5 keys: reuse its observations of the same 3D points via
    # tracks.
    for tr, views in enumerate(scene.tracks):
        pt = recon.track_extra[tr]
        if pt < 0:
            continue
        for img, key in views:
            if img == 5:
                key_descs[5][key] = np.clip(
                    base[pt % num_pts] + rng.integers(-2, 3, 128), 0, 255)

    pdescs = coalesce_point_descriptors(bundle, key_descs)
    result = register_image(bundle, pdescs, key_descs[5], scene.key_xy[5],
                            config=scene.config, seed=11)
    assert result is not None
    # Compare with ground truth pose of camera 5 (same gauge: recon is in
    # the synthetic world frame only up to similarity, so check reprojection
    # instead: localized camera should see many inliers).
    assert result["num_inliers"] > 30


def test_refine_camera_and_points(rng):
    """RefineCameraAndPoints (src/Bundle.cpp:2777-2884): alternating camera
    refine + point re-triangulation recovers from noisy points AND a noisy
    camera guess."""
    from bundler_sfm_tpu.pipeline.register import (
        refine_camera_and_points, refine_points,
    )
    from bundler_sfm_tpu.config import BundlerConfig
    from tests.synthetic import look_at_rotation, project

    f = 700.0
    n = 60
    pts_gt = rng.normal(size=(n, 3)) * 0.5
    # Two existing cameras + the new one.
    centers = [np.array([4.0, 0.2, 0.1]), np.array([-0.2, 4.0, 0.3]),
               np.array([2.5, 2.5, 0.5])]
    Rs = [look_at_rotation(c, np.zeros(3)) for c in centers]
    projs_new = project(Rs[2], centers[2], f, 0, 0, pts_gt)
    views_pv, views_R, views_c = [], [], []
    for X in pts_gt:
        pv = []
        for R, c in zip(Rs[:2], centers[:2]):
            xy = project(R, c, f, 0, 0, X[None])[0]
            pv.append(-xy / f)
        views_pv.append(np.array(pv))
        views_R.append(np.stack(Rs[:2]))
        views_c.append(np.stack(centers[:2]))

    pts_noisy = pts_gt + rng.normal(size=pts_gt.shape) * 0.02
    cam0 = np.concatenate([centers[2] + rng.normal(size=3) * 0.05,
                           np.zeros(3), [f * 1.03], np.zeros(2)])

    class _Shim:
        config = BundlerConfig()

        @staticmethod
        def has_init_focal(_):
            return False

        @staticmethod
        def init_focal(_):
            return 0.0

    cam, R, pts, inl = refine_camera_and_points(
        _Shim, cam0, Rs[2], pts_noisy, projs_new,
        views_pv, views_R, views_c, adjust_focal=True)
    assert len(inl) > 50
    assert np.linalg.norm(cam[0:3] - centers[2]) < 5e-3
    assert cam[6] == pytest.approx(f, rel=5e-3)
    # Points pulled back toward ground truth.
    assert np.linalg.norm(pts[inl] - pts_gt[inl], axis=1).mean() < 5e-3
    # refine_points error is the new-camera RMS reprojection error.
    _, err = refine_points(pts[inl], projs_new[inl],
                           [views_pv[i] for i in inl],
                           [views_R[i] for i in inl],
                           [views_c[i] for i in inl], cam, R)
    assert err < 1.0


def test_match_points_to_keys_directions(rng):
    from bundler_sfm_tpu.pipeline.register import (
        match_keys_to_points, match_points_to_keys,
    )
    P, K = 40, 50
    point_descs = rng.integers(0, 255, (P, 128)).astype(np.uint8)
    # Keys: shuffled copies of the first 30 points + 20 distractors.
    perm = rng.permutation(30)
    new_desc = np.concatenate([
        point_descs[perm],
        rng.integers(0, 255, (K - 30, 128)).astype(np.uint8)])
    m1 = match_keys_to_points(new_desc, point_descs)
    m2 = match_points_to_keys(point_descs, new_desc)
    # Exact copies match in both directions.
    d1 = {int(a): int(b) for a, b in m1}
    d2 = {int(a): int(b) for a, b in m2}
    hits = sum(1 for ki, pi in d1.items()
               if ki < 30 and pi == int(perm[ki]))
    assert hits >= 28
    hits2 = sum(1 for pi, ki in d2.items()
                if ki < 30 and int(perm[ki]) == pi)
    assert hits2 >= 28


def test_points_near_cameras_prefilter():
    """The 20-NN camera prefilter (src/Bundle.cpp:3722-3790) selects only
    points visible from cameras near the position guess."""
    from bundler_sfm_tpu.io.bundlefile import (
        BundleCamera, BundleFile, BundlePoint,
    )
    from bundler_sfm_tpu.pipeline.register import points_near_cameras

    # Two camera clusters far apart; each sees its own points.
    cams = []
    pts = []
    for g, off in enumerate((0.0, 1000.0)):
        for i in range(25):
            R = np.eye(3)
            c = np.array([off + i * 0.1, 0.0, 0.0])
            cams.append(BundleCamera(f=700.0, k1=0.0, k2=0.0, R=R,
                                     t=-R @ c))
        for p in range(40):
            views = np.array([[g * 25 + (p % 25), p, 0.0, 0.0]])
            pts.append(BundlePoint(
                pos=np.array([off, 0.0, 5.0 + p * 0.01]),
                color=np.zeros(3), views=views))
    bundle = BundleFile(cameras=cams, points=pts)

    near0 = points_near_cameras(bundle, np.array([0.0, 0.0, 0.0]),
                                num_nns=20)
    near1 = points_near_cameras(bundle, np.array([1000.0, 0.0, 0.0]),
                                num_nns=20)
    # Only the local cluster's points survive the prefilter.
    assert set(near0).issubset(set(range(40)))
    assert set(near1).issubset(set(range(40, 80)))
    assert len(near0) > 0 and len(near1) > 0


def test_register_image_with_drop_pt(rng):
    """register_image(drop_pt=...) goes through the prefilter and still
    localizes the held-out camera."""
    from bundler_sfm_tpu.pipeline.register import register_image as _ri
    scene, syn = make_pipeline_scene(rng, num_cams=6, num_pts=220)
    num_pts = 220
    base = rng.integers(0, 256, (num_pts, 128)).astype(np.int32)
    key_descs = [rng.integers(0, 256, (len(scene.key_xy[c]), 128)
                              ).astype(np.uint8) for c in range(6)]
    compute_geometric_constraints(scene, seed=3)
    scene.ignore_in_bundle[5] = True
    recon = bundle_adjust_fast(scene, seed=5)
    bundle = to_bundle_file(recon, scene)
    for p_idx, p in enumerate(bundle.points):
        for v in p.views:
            img, key = int(v[0]), int(v[1])
            key_descs[img][key] = np.clip(
                base[p_idx % num_pts] + rng.integers(-2, 3, 128), 0, 255)
    for tr, views in enumerate(scene.tracks):
        pt = recon.track_extra[tr]
        if pt < 0:
            continue
        for img, key in views:
            if img == 5:
                key_descs[5][key] = np.clip(
                    base[pt % num_pts] + rng.integers(-2, 3, 128), 0, 255)
    pdescs = coalesce_point_descriptors(bundle, key_descs)
    # Guess near the reconstructed cameras' centroid.
    centers = [-c.R.T @ c.t for c in bundle.cameras if c.f > 0]
    guess = np.mean(centers, axis=0)
    result = _ri(bundle, pdescs, key_descs[5], scene.key_xy[5],
                 config=scene.config, seed=11, drop_pt=guess, num_nns=3)
    assert result is not None
    assert result["num_inliers"] > 30
