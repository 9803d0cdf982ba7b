import numpy as np
import pytest

from tests.test_pipeline import make_pipeline_scene, similarity_align

from bundler_sfm_tpu.io.intrinsics import (
    Intrinsics, assign_intrinsics, read_intrinsics_file,
)
from bundler_sfm_tpu.pipeline.incremental import (
    bundle_adjust_fast, bundle_adjust_slow, estimate_ignored_cameras,
    write_match_table,
)
from bundler_sfm_tpu.pipeline.verify import compute_geometric_constraints


def test_intrinsics_file(tmp_path):
    path = tmp_path / "intr.txt"
    path.write_text(
        "2\n"
        "700 0 320 0 700 240 0 0 1\n0.01 -0.02 0 0 0\n"
        "900 0 320 0 900 240 0 0 1\n0.0 0.0 0 0 0\n")
    recs = read_intrinsics_file(str(path))
    assert len(recs) == 2
    assert recs[0].focal == pytest.approx(700.0)
    assigned = assign_intrinsics(recs, [710.0, 880.0, 0.0])
    assert assigned[0].focal == pytest.approx(700.0)
    assert assigned[1].focal == pytest.approx(900.0)
    assert assigned[2] is None


def test_write_match_table(rng, tmp_path, monkeypatch):
    scene, _ = make_pipeline_scene(rng, num_cams=3, num_pts=60)
    monkeypatch.chdir(tmp_path)
    write_match_table(scene, ".prune")
    n_txt = (tmp_path / "nmatches.prune.txt").read_text().split()
    assert int(n_txt[0]) == 3
    assert (tmp_path / "matches.prune.txt").exists()


@pytest.mark.slow
def test_slow_bundle_and_ignored(rng, tmp_path):
    scene, syn = make_pipeline_scene(rng, num_cams=5, num_pts=200)
    compute_geometric_constraints(scene, seed=2)
    recon = bundle_adjust_slow(scene, out_dir=str(tmp_path), seed=5)
    assert recon.num_cameras == 5
    est = np.stack([recon.cam_params[s][0:3] for s in range(5)])
    gt = np.stack([syn.centers[i] for i in recon.added_order])
    assert similarity_align(est, gt) < 0.02
    assert (tmp_path / "bundle.out").exists()


@pytest.mark.slow
def test_estimate_ignored_recovers_camera(rng):
    scene, syn = make_pipeline_scene(rng, num_cams=5, num_pts=200)
    compute_geometric_constraints(scene, seed=2)
    scene.ignore_in_bundle[4] = True
    recon = bundle_adjust_fast(scene, seed=5)
    assert recon.num_cameras == 4
    n = estimate_ignored_cameras(recon, scene, seed=9)
    assert n == 1
    assert recon.num_cameras == 5
