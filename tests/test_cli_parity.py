"""CLI flag parity with the reference's option table
(`src/BundlerApp.cpp:212-337`) and the bundle-surgery / I/O behaviors the
new flags drive."""

import numpy as np
import pytest

from bundler_sfm_tpu.bundler import build_parser, parse_with_options_file
from bundler_sfm_tpu.io.bundlefile import (BundleCamera, BundleFile,
                                           BundlePoint, write_bundle_file)


def _rot(deg, axis=2):
    rad = np.deg2rad(deg)
    c, s = np.cos(rad), np.sin(rad)
    R = np.eye(3)
    i, j = [(1, 2), (0, 2), (0, 1)][axis]
    R[i, i] = c; R[i, j] = -s; R[j, i] = s; R[j, j] = c
    return R


def _toy_bundle(num_cams=3, num_pts=30, seed=0):
    rng = np.random.default_rng(seed)
    cams, pts = [], []
    Rs = [_rot(10 * i, axis=1) for i in range(num_cams)]
    centers = [np.array([i * 1.0, 0.0, 0.0]) for i in range(num_cams)]
    for R, c in zip(Rs, centers):
        cams.append(BundleCamera(f=700.0, k1=0.0, k2=0.0, R=R, t=-R @ c))
    for _ in range(num_pts):
        X = rng.normal(0, 1, 3) + [1.0, 0.0, 8.0]
        views = []
        for ci, (R, c) in enumerate(zip(Rs, centers)):
            pc = R @ (X - c)
            uv = -pc[:2] / pc[2]
            views.append((ci, len(pts), 700.0 * uv[0], 700.0 * uv[1]))
        pts.append(BundlePoint(pos=X, color=np.array([128, 128, 128]),
                               views=np.array(views)))
    return BundleFile(cameras=cams, points=pts)


def test_reference_option_table_accepted():
    """Every option in the reference's getopt table (SURVEY.md §2.1) parses."""
    ref_flags_value = [
        "constrain_focal_weight 0.0001", "homography_threshold 6",
        "homography_rounds 256", "fmatrix_threshold 9", "fmatrix_rounds 2048",
        "projection_estimation_threshold 4", "min_proj_error_threshold 8",
        "max_proj_error_threshold 16", "ray_angle_threshold 2",
        "init_focal_length 532", "min_max_matches 16",
        "num_matches_add_camera 8", "init_pair1 0", "init_pair2 1",
        "up_image 0", "min_camera_distance_ratio 0",
        "baseline_threshold -1", "covariance_fix1 1", "covariance_fix2 2",
        "min_feature_matches 16", "image_rescale 1.0", "morph_steps 0",
        "stretch_factor 1.0", "distortion_weight 100",
        "point_constraint_weight 0", "ann_max_pts_visit 400",
        "min_track_views 2", "max_track_views 100",
        "keypoint_border_width 0", "keypoint_border_bottom 0",
        "match_dir .", "key_dir .", "image_dir .", "output_dir .",
        "output bundle.out", "output_all bundle_",
    ]
    ref_flags_bool = [
        "run_bundle", "rerun_bundle", "slow_bundle", "variable_focal_length",
        "fixed_focal_length", "use_focal_estimate", "trust_focal_estimate",
        "constrain_focal", "only_bundle_init_focal", "estimate_distortion",
        "skip_fmatrix", "skip_homographies", "panorama_mode",
        "estimate_ignored", "skip_full_bundle", "skip_add_points",
        "use_ceres", "construct_max_connectivity", "no_factor_essential",
        "fix_necker", "use_constraints", "use_angular_score",
        "optimize_for_fisheye", "compute_covariance", "analyze_matches",
        "assemble", "enrich_points", "detect_duplicates", "classify_photos",
        "compare_histograms", "compute_color_statistics", "day_photos",
        "night_photos", "cloudy_photos", "bundle_from_points",
        "bundle_from_tracks", "projective_cameras", "projective_points",
        "use_fit_plane", "zero_distortion_params", "prune_bad_points",
        "compress_list", "reposition_scene", "estimate_up_vector_szeliski",
    ]
    argv = ["list.txt"]
    for fv in ref_flags_value:
        k, v = fv.split()
        argv += [f"--{k}", v]
    argv += [f"--{b}" for b in ref_flags_bool]
    args = build_parser().parse_args(argv)
    assert args.run_bundle and args.no_factor_essential


def test_options_file_recursion_with_new_flags(tmp_path):
    opt = tmp_path / "options.txt"
    opt.write_text("variable_focal_length\nno_factor_essential\n"
                   "up_image 2\n")
    args = parse_with_options_file(["list.txt", "--options_file", str(opt)])
    assert args.variable_focal_length and args.no_factor_essential
    assert args.up_image == 2


def test_rotate_cameras_roll_preserves_centers():
    from bundler_sfm_tpu.export.process import rotate_cameras_roll
    b = _toy_bundle()
    out = rotate_cameras_roll(b, [0.0, 90.0, -45.0])
    for cam0, cam1, deg in zip(b.cameras, out.cameras, [0.0, 90.0, -45.0]):
        np.testing.assert_allclose(cam0.center, cam1.center, atol=1e-12)
        # Rolling the camera turns the stored R by Rz.
        np.testing.assert_allclose(cam1.R, _rot(deg) @ cam0.R, atol=1e-12)
    # Points untouched (roll is per-camera, not a scene transform).
    np.testing.assert_allclose(out.points[0].pos, b.points[0].pos)


def test_read_per_image_values(tmp_path):
    from bundler_sfm_tpu.export.process import read_per_image_values
    f = tmp_path / "vals.txt"
    f.write_text("img0.jpg 0.0\nimg1.jpg 90.0\nimg2.jpg -45.5\n")
    v = read_per_image_values(str(f), 3)
    np.testing.assert_allclose(v, [0.0, 90.0, -45.5])


def test_track_file_roundtrip(tmp_path):
    from bundler_sfm_tpu.pipeline.tracks import (read_track_file,
                                                 write_track_file)
    tracks = [[(0, 5), (1, 7)], [(0, 1), (2, 3), (1, 9)]]
    path = str(tmp_path / "tracks.txt")
    write_track_file(path, 3, tracks)
    n_img, back = read_track_file(path)
    assert n_img == 3 and back == tracks


def test_match_file_variants_roundtrip(tmp_path):
    from bundler_sfm_tpu.io.matchfile import (read_match_indexes,
                                              read_pair_match_files)
    m01 = np.array([[0, 1], [2, 3], [4, 5]] * 6, np.int32)   # 18 >= 16
    m12 = np.array([[1, 0]] * 16, np.int32)
    # Per-pair match-%03d-%03d.txt files.
    for (i, j), m in (((0, 1), m01), ((1, 2), m12)):
        with open(tmp_path / f"match-{i:03d}-{j:03d}.txt", "w") as f:
            f.write(f"{len(m)}\n")
            for a, b in m:
                f.write(f"{a} {b}\n")
    got = read_pair_match_files(str(tmp_path), 3)
    np.testing.assert_array_equal(got[(0, 1)], m01)
    np.testing.assert_array_equal(got[(1, 2)], m12)
    # Per-image match-%03d.txt index files (j, count, pairs blocks).
    with open(tmp_path / "match-000.txt", "w") as f:
        f.write("1\n" + f"{len(m01)}\n")
        for a, b in m01:
            f.write(f"{a} {b}\n")
    got = read_match_indexes(str(tmp_path), 3)
    np.testing.assert_array_equal(got[(0, 1)], m01)


def test_scene_covariance_blocks_spd():
    from bundler_sfm_tpu.pipeline.two_frame import (scene_covariance,
                                                    write_covariance_file)
    b = _toy_bundle(num_cams=3, num_pts=60)
    regs, cov, blocks = scene_covariance(b)
    assert regs == [0, 1, 2] and len(blocks) == 3
    for C in blocks:
        w = np.linalg.eigvalsh(C)
        assert (w > 0).all()          # SPD position covariance
        assert np.trace(C) < 1.0      # well-constrained toy scene
    import io as _io
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "covariance.txt")
        write_covariance_file(path, regs, blocks)
        lines = open(path).read().splitlines()
        assert len(lines) == 9 and lines[0] == "0"


def test_camera_refine_trim_matches_host_loop(rng):
    """The fused refine-and-trim program reproduces the host-loop semantics
    of `RefineCameraParameters` (src/Bundle.cpp:2535-2694)."""
    import jax
    import jax.numpy as jnp
    from bundler_sfm_tpu.ops.lm import camera_refine, camera_refine_trim

    n, pad = 90, 128
    R = _rot(15, axis=1)
    c = np.array([0.2, -0.1, 0.3])
    f = 650.0
    X = rng.normal(0, 1, (pad, 3)) + [0, 0, 6]
    pc = (X - c) @ R.T
    uv = -pc[:, :2] / pc[:, 2:3]
    projs = f * uv + rng.normal(0, 0.3, (pad, 2))
    projs[5] += 80.0   # gross outliers that must be trimmed
    projs[17] += 120.0
    mask0 = np.zeros(pad, bool); mask0[:n] = True
    cam0 = np.zeros(9); cam0[0:3] = c + rng.normal(0, 0.02, 3); cam0[6] = 640.0

    camf, Rf, maskf = camera_refine_trim(
        jnp.asarray(cam0), jnp.asarray(R), jnp.asarray(X), jnp.asarray(projs),
        jnp.asarray(mask0), True, False, 0.0, 0.0, 1e2, 50, 1e-3,
        2.0, 8.0, 16.0)

    # Host reference loop (the pre-fusion implementation).
    cam, Rh = np.asarray(cam0), np.asarray(R)
    mask = mask0.copy()
    camr, Rr, _ = camera_refine(jnp.asarray(cam), jnp.asarray(Rh),
                                jnp.asarray(X), jnp.asarray(projs),
                                jnp.asarray(mask), False, False,
                                0.0, 0.0, 1e2, 50, 1e-3)
    cam, Rh = np.asarray(camr), np.asarray(Rr)
    for _ in range(20):
        camr, Rr, _ = camera_refine(jnp.asarray(cam), jnp.asarray(Rh),
                                    jnp.asarray(X), jnp.asarray(projs),
                                    jnp.asarray(mask), True, False,
                                    0.0, 0.0, 1e2, 50, 1e-3)
        cam, Rh = np.asarray(camr), np.asarray(Rr)
        sel = np.nonzero(mask)[0]
        pch = (X[sel] - cam[0:3]) @ Rh.T
        uvh = -pch[:, :2] / pch[:, 2:3]
        pred = cam[6] * uvh
        errs = np.linalg.norm(pred - projs[sel], axis=1)
        k95 = min(int(round(0.95 * len(errs))), len(errs) - 1)
        med = np.partition(errs, k95)[k95]
        thr = np.clip(1.2 * 2.0 * med, 8.0, 16.0)
        keep = errs < thr
        if keep.all():
            break
        mask[sel[~keep]] = False

    np.testing.assert_array_equal(np.asarray(maskf), mask)
    assert not mask[5] and not mask[17]
    np.testing.assert_allclose(np.asarray(camf), cam, rtol=1e-6, atol=1e-8)
