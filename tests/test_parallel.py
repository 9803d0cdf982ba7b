"""SPMD tests on the 8-device virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8 — the standard way to test sharding
without a pod, SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.synthetic import Scene
from tests.test_matching import brute_force_matches, make_descs

from bundler_sfm_tpu.ops.ba import CNP, build_problem, run_ba
from bundler_sfm_tpu.ops.matching import prune_double_matches
from bundler_sfm_tpu.ops.rotations import rodrigues
from bundler_sfm_tpu.parallel.mesh import make_mesh
from bundler_sfm_tpu.parallel.ba_sharded import (
    run_ba_sharded, shard_problem, unshard_points,
)
from bundler_sfm_tpu.parallel.matching_sharded import match_pairs_sharded


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_matching_matches_single_device(rng):
    mesh = make_mesh()
    base = make_descs(rng, 100)
    descs = [make_descs(rng, 90 + 7 * i, seed_descs=base, n_shared=40)
             for i in range(6)]
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    got = match_pairs_sharded(descs, pairs, mesh, block=128, min_matches=0,
                              pairs_per_device=2)
    for (i, j) in pairs:
        want = prune_double_matches(brute_force_matches(descs[i], descs[j]))
        if len(want) == 0:
            assert (i, j) not in got or len(got[(i, j)]) == 0
        else:
            assert np.array_equal(got[(i, j)], want), (i, j)


def _make_ba_inputs(rng, num_cams=4, num_pts=100):
    sc = Scene(rng, num_cams=num_cams, num_pts=num_pts)
    cam0 = np.zeros((num_cams, CNP))
    R0 = np.zeros((num_cams, 3, 3))
    for i in range(num_cams):
        w = rng.normal(size=3) * 0.02
        R0[i] = np.asarray(rodrigues(jnp.asarray(w))) @ sc.R[i]
        cam0[i, 0:3] = sc.centers[i] + rng.normal(size=3) * 0.02
        cam0[i, 6] = sc.f[i]
    pts0 = sc.points + rng.normal(size=sc.points.shape) * 0.03
    obs_cam, obs_pt, obs_xy = [], [], []
    for c in range(num_cams):
        for p in range(num_pts):
            obs_cam.append(c)
            obs_pt.append(p)
            obs_xy.append(sc.obs[c][p])
    return (sc, R0, cam0, pts0, np.array(obs_cam, np.int32),
            np.array(obs_pt, np.int32), np.array(obs_xy))


def test_sharded_ba_matches_single_device(rng):
    mesh = make_mesh()
    sc, R0, cam0, pts0, oc, op, oxy = _make_ba_inputs(rng)
    num_pts = len(pts0)

    prob1 = build_problem(R0, cam0, pts0, oc, op, oxy,
                          est_focal=True, est_distortion=False)
    res1 = run_ba(prob1, max_iters=40)

    probN = shard_problem(R0, cam0, pts0, oc, op, oxy, num_shards=8,
                          est_focal=True, est_distortion=False)
    resN = run_ba_sharded(probN, mesh, max_iters=40)

    # Both converge to (numerically) zero cost on clean synthetic data.
    assert float(res1.cost) < 1e-6
    assert float(resN.cost) < 1e-6
    # Same camera solution.
    assert np.allclose(np.asarray(resN.cam)[:4], np.asarray(res1.cam)[:4],
                       atol=1e-5)
    # Point shards reassemble to the single-device solution.
    ptsN = unshard_points(np.asarray(resN.pts), num_pts)
    assert np.allclose(ptsN, np.asarray(res1.pts)[:num_pts], atol=1e-5)


def test_sharded_ba_with_constraints(rng):
    mesh = make_mesh()
    sc, R0, cam0, pts0, oc, op, oxy = _make_ba_inputs(rng, num_cams=3)
    C = 3
    cc = np.zeros((C, CNP)); cc[:, 6] = 1.0
    ct = np.zeros((C, CNP)); ct[:, 6] = 700.0
    cw = np.zeros((C, CNP)); cw[:, 6] = 1e5
    prob1 = build_problem(R0, cam0, pts0, oc, op, oxy,
                          est_focal=True, est_distortion=False,
                          cam_constrained=cc, cam_constraints=ct,
                          cam_weights=cw)
    res1 = run_ba(prob1, max_iters=30)
    probN = shard_problem(R0, cam0, pts0, oc, op, oxy, num_shards=8,
                          est_focal=True, est_distortion=False,
                          cam_constrained=cc, cam_constraints=ct,
                          cam_weights=cw)
    resN = run_ba_sharded(probN, mesh, max_iters=30)
    # The 1/D weight scaling reconstructs the constraint exactly: same focal.
    assert np.allclose(np.asarray(resN.cam)[:3, 6],
                       np.asarray(res1.cam)[:3, 6], atol=1e-6)


def test_sharded_ba_cg_matches_cholesky(rng):
    """Matrix-free distributed PCG (solver='cg': [C,9]-psum matvec, true
    SCHUR_JACOBI diag) reaches the replicated dense Cholesky solution."""
    mesh = make_mesh()
    sc, R0, cam0, pts0, oc, op, oxy = _make_ba_inputs(rng)
    probN = shard_problem(R0, cam0, pts0, oc, op, oxy, num_shards=8,
                          est_focal=True, est_distortion=False)
    r_chol = run_ba_sharded(probN, mesh, max_iters=40)
    r_cg = run_ba_sharded(probN, mesh, max_iters=40, solver="cg")
    assert float(r_cg.cost) < 1e-6
    assert np.allclose(np.asarray(r_cg.cam)[:4], np.asarray(r_chol.cam)[:4],
                       atol=1e-5)


def test_sharded_outlier_loop_matches_single_device(rng):
    """The fused RunSFM outlier loop gives the same removals and cameras on
    the 8-device mesh as on one device (the production multi-chip BA path)."""
    from bundler_sfm_tpu.ops.ba import (
        build_cam_obs_table, run_ba_outlier_loop,
    )
    from bundler_sfm_tpu.parallel.ba_sharded import (
        build_cam_obs_table_sharded, run_ba_outlier_loop_sharded,
        unshard_flat,
    )
    mesh = make_mesh()
    sc = Scene(rng, num_cams=4, num_pts=160, noise=0.5)
    C, Pn = 4, 160
    cam0 = np.zeros((C, CNP))
    R0 = np.stack(sc.R[:C])
    for i in range(C):
        cam0[i, 0:3] = sc.centers[i]
        cam0[i, 6] = sc.f[i]
    obs_cam, obs_pt, obs_xy = [], [], []
    for c in range(C):
        for p in range(Pn):
            obs_cam.append(c); obs_pt.append(p); obs_xy.append(sc.obs[c][p])
    obs_cam = np.array(obs_cam, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    obs_xy = np.array(obs_xy)
    bad_pts = rng.choice(Pn, 10, replace=False)
    bad_sel = np.isin(obs_pt, bad_pts)
    obs_xy[bad_sel] += rng.uniform(60, 120, (bad_sel.sum(), 2))
    pts0 = sc.points + rng.normal(size=sc.points.shape) * 0.02

    prob1 = build_problem(R0, cam0, pts0, obs_cam, obs_pt, obs_xy,
                          est_distortion=False)
    co1, cm1 = build_cam_obs_table(obs_cam, obs_pt, C)
    res1 = run_ba_outlier_loop(prob1, jnp.asarray(co1), jnp.asarray(cm1),
                               max_iters=50, min_outliers=2, max_passes=4)

    probN = shard_problem(R0, cam0, pts0, obs_cam, obs_pt, obs_xy,
                          num_shards=8, est_distortion=False)
    Pp_s, M_s = probN.views_mask.shape[1:]
    coN, cmN = build_cam_obs_table_sharded(obs_cam, obs_pt, 8, C, Pp_s, M_s)
    resN = run_ba_outlier_loop_sharded(
        probN, jnp.asarray(coN), jnp.asarray(cmN), mesh,
        max_iters=50, min_outliers=2, max_passes=4)

    rem1 = np.asarray(res1.pt_removed)[:Pn]
    remN = unshard_flat(np.asarray(resN.pt_removed), Pn)
    np.testing.assert_array_equal(rem1, remN)
    assert rem1[bad_pts].all()
    assert int(resN.passes) == int(res1.passes)
    assert np.allclose(np.asarray(resN.cam)[:C], np.asarray(res1.cam)[:C],
                       atol=1e-5)
    # Per-camera stats agree (pass 0: all observations present).
    s1 = np.asarray(res1.stats)[0, :C]
    sN = np.asarray(resN.stats)[0, :C]
    np.testing.assert_array_equal(s1[:, 0], sN[:, 0])
    np.testing.assert_allclose(s1[:, 1:], sN[:, 1:], rtol=1e-6, atol=1e-8)


def test_descriptor_table_sharded_matches_single(rng):
    """Production table matcher with a mesh = identical matches."""
    from bundler_sfm_tpu.ops.matching import DescriptorTable
    mesh = make_mesh()
    base = make_descs(rng, 120)
    descs = [make_descs(rng, 100 + 5 * i, seed_descs=base, n_shared=50)
             for i in range(6)]
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    t1 = DescriptorTable(descs, block=128)
    tN = DescriptorTable(descs, block=128, mesh=mesh)
    m1 = t1.match_pairs(pairs, min_matches=0)
    mN = tN.match_pairs(pairs, min_matches=0)
    assert set(m1.keys()) == set(mN.keys())
    for k in m1:
        np.testing.assert_array_equal(m1[k], mN[k])


@pytest.mark.slow
def test_e2e_pipeline_multi_device(rng, tmp_path):
    """Full reconstruction with config.num_devices=8 (sharded matcher + BA)
    matches the single-device pipeline on the virtual mesh."""
    from tests.test_pipeline import make_pipeline_scene, similarity_align
    from bundler_sfm_tpu.pipeline.verify import compute_geometric_constraints
    from bundler_sfm_tpu.pipeline.incremental import bundle_adjust_fast
    import dataclasses
    import copy

    scene1, syn = make_pipeline_scene(rng)
    compute_geometric_constraints(scene1, seed=3)
    sceneN = copy.deepcopy(scene1)
    sceneN.config = dataclasses.replace(sceneN.config, num_devices=8)

    rec1 = bundle_adjust_fast(scene1, out_dir=str(tmp_path / "d1"), seed=5)
    recN = bundle_adjust_fast(sceneN, out_dir=str(tmp_path / "d8"), seed=5)

    assert recN.num_cameras == rec1.num_cameras == 6
    n1 = sum(1 for v in rec1.pt_views if v)
    nN = sum(1 for v in recN.pt_views if v)
    assert abs(n1 - nN) <= max(3, 0.02 * n1)
    c1 = np.stack([rec1.cam_params[s][0:3] for s in range(6)])
    cN = np.stack([recN.cam_params[s][0:3]
                   for s in range(recN.num_cameras)])
    # Same image order and near-identical centers.
    assert recN.added_order == rec1.added_order
    assert np.allclose(c1, cN, atol=1e-4)


def test_ring_sharded_table_matches_single(rng):
    """The ppermute ring pass over the image-sharded descriptor table gives
    the same all-pairs matches as the single-device table."""
    from bundler_sfm_tpu.ops.matching import DescriptorTable
    from bundler_sfm_tpu.parallel.matching_sharded import (
        ShardedDescriptorTable,
    )
    mesh = make_mesh()
    base = make_descs(rng, 120)
    # 13 images (not a multiple of 8) exercises shard padding.
    descs = [make_descs(rng, 100 + 3 * i, seed_descs=base, n_shared=50)
             for i in range(13)]
    pairs = [(i, j) for i in range(13) for j in range(i + 1, 13)]
    t1 = DescriptorTable(descs, block=128)
    want = t1.match_pairs(pairs, min_matches=1)
    ring = ShardedDescriptorTable(descs, mesh, block=128)
    got = ring.match_all_pairs(min_matches=1)
    assert set(got.keys()) == set(want.keys())
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_ring_match_pairs_production_entry(rng):
    """ShardedDescriptorTable.match_pairs (the run_bundler --num_devices
    matcher) filters the ring output to the requested pair list,
    bit-identical to the single-device table, honoring min_matches."""
    from bundler_sfm_tpu.ops.matching import DescriptorTable
    from bundler_sfm_tpu.parallel.matching_sharded import (
        ShardedDescriptorTable,
    )
    mesh = make_mesh()
    base = make_descs(rng, 120)
    descs = [make_descs(rng, 96 + 5 * i, seed_descs=base, n_shared=40)
             for i in range(10)]
    # Window-limited pair list (radius 3), like KeyMatchFull's banding.
    pairs = [(j, i) for i in range(10) for j in range(max(0, i - 3), i)]
    t1 = DescriptorTable(descs, block=128)
    want = t1.match_pairs(pairs, min_matches=16)
    ring = ShardedDescriptorTable(descs, mesh, block=128)
    got = ring.match_pairs(pairs, min_matches=16)
    assert set(got.keys()) == set(want.keys())
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def _linear_visibility_inputs(rng, C=16, Pn=600, span=8):
    """Narrow-span scene: point p sees a contiguous <=span camera window —
    the covisibility structure plan_schur_windows exploits."""
    sc = Scene(rng, num_cams=C, num_pts=Pn, noise=0.3)
    cam0 = np.zeros((C, CNP))
    R0 = np.stack(sc.R[:C])
    for i in range(C):
        cam0[i, 0:3] = sc.centers[i] + rng.normal(size=3) * 0.01
        cam0[i, 6] = sc.f[i]
    obs_cam, obs_pt = [], []
    half = span // 2
    for p in range(Pn):
        # Spans aligned to half-window steps so the planner keeps every
        # point narrow (plan_schur_windows' w_idx quantization).
        lo = half * int(rng.integers(0, (C - span) // half + 1))
        n = int(rng.integers(3, span + 1))
        for c in lo + rng.permutation(span)[:n]:
            obs_cam.append(c)
            obs_pt.append(p)
    obs_cam = np.array(obs_cam, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    order = np.argsort(obs_pt, kind="stable")
    obs_cam, obs_pt = obs_cam[order], obs_pt[order]
    obs_xy = np.stack([sc.obs[c][p] for c, p in zip(obs_cam, obs_pt)])
    pts0 = sc.points + rng.normal(size=sc.points.shape) * 0.02
    return R0, cam0, pts0, obs_cam, obs_pt, obs_xy


def test_sharded_windowed_ba_matches_single_device(rng):
    """Covisibility-windowed Schur on the DISTRIBUTED path: whole point-
    groups per shard (plan_shard_windows), shard-local windowed assembly,
    psum — same solution as the single-device windowed run and the plain
    full-C run."""
    from bundler_sfm_tpu.ops.ba import plan_schur_windows
    from bundler_sfm_tpu.parallel.ba_sharded import (
        plan_shard_windows, unshard_with_map,
    )
    mesh = make_mesh()
    R0, cam0, pts0, oc, op, oxy = _linear_visibility_inputs(rng)
    C, Pn = len(cam0), len(pts0)
    M = int(np.bincount(op).max())
    plan = plan_schur_windows(oc, op, Pn, C, M, min_cameras=8, windows=(8,))
    assert plan is not None
    row_of, schur_win, W, G, n_rows = plan

    # Plain full-C reference.
    prob1 = build_problem(R0, cam0, pts0, oc, op, oxy, est_distortion=False)
    res1 = run_ba(prob1, max_iters=25)

    shard_of, local_of, sw_local, rows_s = plan_shard_windows(
        row_of, schur_win, W, G, n_rows, 8)
    probN = shard_problem(R0, cam0, pts0, oc, op, oxy, num_shards=8,
                          est_distortion=False, max_views=M,
                          pad_pts_per_shard=rows_s,
                          shard_of_pt=shard_of, local_idx=local_of,
                          schur_win_local=sw_local)
    assert probN.schur_win is not None
    resN = run_ba_sharded(probN, mesh, max_iters=25, window=W, group_pts=G)
    assert float(resN.cost) <= float(res1.cost) * (1 + 1e-6)
    np.testing.assert_allclose(np.asarray(resN.cam)[:C],
                               np.asarray(res1.cam)[:C],
                               rtol=1e-4, atol=1e-5)
    ptsN = unshard_with_map(np.asarray(resN.pts), shard_of, local_of)
    np.testing.assert_allclose(ptsN, np.asarray(res1.pts)[:Pn],
                               rtol=1e-4, atol=1e-5)


def test_sharded_windowed_outlier_loop_matches_single_device(rng):
    """The fused outlier loop with windows active on the 8-device mesh:
    same removals/stats as the single-device loop (and the sharded stats
    pass uses only shard-local tables — no global obs all_gather)."""
    from bundler_sfm_tpu.ops.ba import (
        build_cam_obs_table, plan_schur_windows, run_ba_outlier_loop,
    )
    from bundler_sfm_tpu.parallel.ba_sharded import (
        build_cam_obs_table_sharded, plan_shard_windows,
        run_ba_outlier_loop_sharded, unshard_with_map,
    )
    mesh = make_mesh()
    R0, cam0, pts0, oc, op, oxy = _linear_visibility_inputs(rng, Pn=500)
    C, Pn = len(cam0), len(pts0)
    bad_pts = rng.choice(Pn, 8, replace=False)
    sel = np.isin(op, bad_pts)
    oxy[sel] += rng.uniform(60, 120, (sel.sum(), 2))
    M = int(np.bincount(op).max())
    kw = dict(max_iters=40, min_outliers=2, max_passes=4)

    prob1 = build_problem(R0, cam0, pts0, oc, op, oxy, est_distortion=False)
    co1, cm1 = build_cam_obs_table(oc, op, C)
    res1 = run_ba_outlier_loop(prob1, jnp.asarray(co1), jnp.asarray(cm1),
                               **kw)

    plan = plan_schur_windows(oc, op, Pn, C, M, min_cameras=8, windows=(8,))
    assert plan is not None
    row_of, schur_win, W, G, n_rows = plan
    shard_of, local_of, sw_local, rows_s = plan_shard_windows(
        row_of, schur_win, W, G, n_rows, 8)
    probN = shard_problem(R0, cam0, pts0, oc, op, oxy, num_shards=8,
                          est_distortion=False, max_views=M,
                          pad_pts_per_shard=rows_s,
                          shard_of_pt=shard_of, local_idx=local_of,
                          schur_win_local=sw_local)
    coN, cmN = build_cam_obs_table_sharded(
        oc, op, 8, C, rows_s, M, shard_of_pt=shard_of, local_idx=local_of)
    resN = run_ba_outlier_loop_sharded(
        probN, jnp.asarray(coN), jnp.asarray(cmN), mesh,
        window=W, group_pts=G, **kw)

    rem1 = np.asarray(res1.pt_removed)[:Pn]
    remN = unshard_with_map(np.asarray(resN.pt_removed), shard_of, local_of)
    np.testing.assert_array_equal(rem1, remN)
    assert rem1[bad_pts].all()
    assert int(resN.passes) == int(res1.passes)
    s1 = np.asarray(res1.stats)[0, :C]
    sN = np.asarray(resN.stats)[0, :C]
    np.testing.assert_array_equal(s1[:, 0], sN[:, 0])
    np.testing.assert_allclose(s1[:, 1:], sN[:, 1:], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(resN.cam)[:C],
                               np.asarray(res1.cam)[:C],
                               rtol=1e-4, atol=1e-5)
