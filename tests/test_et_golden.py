"""End-to-end test on the reference's second example dataset
(`examples/ET/`, 9 images; SURVEY.md §4/§6).  The reference ships no golden
bundle.out for ET — only the dataset + `bundler.config.example` — so this
asserts reconstruction health (cameras registered, reprojection error,
EXIF-consistent focal lengths) rather than a golden diff.

Slow — run explicitly: pytest tests/test_et_golden.py -m slow
"""

import os

import numpy as np
import pytest

ET_DIR = "/root/reference/examples/ET"


@pytest.mark.slow
def test_et_end_to_end(tmp_path):
    from bundler_sfm_tpu.config import default_pipeline_config
    from bundler_sfm_tpu.features.sift import extract_sift, load_grayscale
    from bundler_sfm_tpu.io.exif import extract_focal_pixels
    from bundler_sfm_tpu.io.listfile import ImageEntry
    from bundler_sfm_tpu.io.keyfile import keys_to_centered
    from bundler_sfm_tpu.ops.matching import match_pairs_batched
    from bundler_sfm_tpu.pipeline.scene import Scene
    from bundler_sfm_tpu.pipeline.verify import compute_geometric_constraints
    from bundler_sfm_tpu.pipeline.incremental import (
        bundle_adjust_fast, run_sfm,
    )

    images = sorted(f for f in os.listdir(ET_DIR) if f.endswith(".jpg"))
    assert len(images) == 9

    infos, descs, dims, focals = [], [], [], []
    for name in images:
        path = os.path.join(ET_DIR, name)
        gray = load_grayscale(path)
        info, desc = extract_sift(gray, max_keys_total=4096,
                                  contrast_thr=0.02)
        infos.append(info)
        descs.append(desc)
        dims.append((gray.shape[1], gray.shape[0]))
        # EXIF focal via the CCD-width table (bin/extract_focal.pl logic).
        focals.append(extract_focal_pixels(path))
    assert all(abs(f - 661.6) < 1.0 for f in focals)  # Canon PowerShot S110

    n = len(images)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    matches = match_pairs_batched(descs, pairs, min_matches=16)
    assert len(matches) >= 8, f"only {len(matches)} verified pairs"

    cfg = default_pipeline_config(fmatrix_rounds=1024, homography_rounds=128,
                                  projection_rounds=2048, sfm_max_iters=100)
    entries = [ImageEntry(nm, init_focal=f) for nm, f in zip(images, focals)]
    key_xy = [keys_to_centered(info, w, h)[:, :2].astype(np.float64)
              for info, (w, h) in zip(infos, dims)]
    scene = Scene(config=cfg, entries=entries, dims=dims, key_xy=key_xy,
                  matches=matches)
    compute_geometric_constraints(scene, seed=0)
    assert len(scene.tracks) > 200

    recon = bundle_adjust_fast(scene, out_dir=str(tmp_path), seed=0)
    n_cams = recon.num_cameras
    n_pts = sum(1 for v in recon.pt_views if v)
    # At the 4096-key / 0.02-contrast budget this pipeline registers all
    # 9 ET cameras with ~1662 points at 0.20 px mean reprojection error.
    assert n_cams >= 8, f"registered only {n_cams} cameras"
    assert n_pts >= 1200, f"only {n_pts} points"

    err = run_sfm(recon, scene, remove_outliers=False, verbose=False)
    assert err < 0.6, f"mean reprojection error {err}"

    # Optimized focals should stay near the EXIF prior (661.6 px).
    f_est = [recon.cam_params[s][6] for s in range(n_cams)]
    assert all(550 < f < 800 for f in f_est), f_est
