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


def test_similarity_ransac(rng):
    import jax
    import jax.numpy as jnp
    from bundler_sfm_tpu.ops.horn import (
        estimate_similarity_ransac, similarity_transfer_dist,
    )
    theta, s = 0.3, 1.4
    R = s * np.array([[np.cos(theta), -np.sin(theta)],
                      [np.sin(theta), np.cos(theta)]])
    t = np.array([5.0, -3.0])
    p1 = rng.uniform(-100, 100, (80, 2))
    p2 = p1 @ R.T + t
    p2[:15] += rng.normal(size=(15, 2)) * 50  # outliers
    pad = np.zeros((128, 2)); pad[:80] = p1
    pad2 = np.zeros((128, 2)); pad2[:80] = p2
    M, inl, cnt = estimate_similarity_ransac(
        jax.random.PRNGKey(0), jnp.asarray(pad), jnp.asarray(pad2),
        jnp.int32(80), jnp.float64(2.0), num_rounds=128)
    d = np.asarray(similarity_transfer_dist(M, jnp.asarray(p1[15:]),
                                            jnp.asarray(p2[15:])))
    assert np.median(d) < 0.5
    assert int(cnt) >= 60


def test_border_match_filter(rng):
    from bundler_sfm_tpu.pipeline.verify import remove_border_matches
    scene, _ = make_pipeline_scene(rng, num_cams=2, num_pts=50)
    scene.config = __import__("dataclasses").replace(
        scene.config, keypoint_border_width=100)
    before = {k: len(v) for k, v in scene.matches.items()}
    remove_border_matches(scene)
    after = {k: len(v) for k, v in scene.matches.items()}
    assert all(after[k] <= before[k] for k in before)
    # Remaining matches are inside the border on both sides.
    for (i, j), m in scene.matches.items():
        for img, col in ((i, 0), (j, 1)):
            w, h = scene.dims[img]
            xy = scene.key_xy[img][m[:, col]]
            assert (np.abs(xy[:, 0]) <= 0.5 * w - 100 + 1e-9).all()
