import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.synthetic import Scene

from bundler_sfm_tpu.ops.ba import (
    BAProblem, build_problem, run_ba, compute_cost, CNP,
)
from bundler_sfm_tpu.ops.lm import camera_refine
from bundler_sfm_tpu.ops.projection import pack_camera
from bundler_sfm_tpu.ops.rotations import rodrigues


def make_problem(rng, sc: Scene, cam_noise=0.0, pt_noise=0.0,
                 est_focal=True, est_distortion=True, f_guess=None, **kw):
    C = len(sc.centers)
    P = len(sc.points)
    cam0 = np.zeros((C, CNP))
    R0 = np.zeros((C, 3, 3))
    for i in range(C):
        w = rng.normal(size=3) * cam_noise
        R0[i] = np.asarray(rodrigues(jnp.asarray(w))) @ sc.R[i]
        cam0[i, 0:3] = sc.centers[i] + rng.normal(size=3) * cam_noise
        cam0[i, 6] = f_guess if f_guess is not None else sc.f[i]
        cam0[i, 7:9] = 0.0
    pts0 = sc.points + rng.normal(size=sc.points.shape) * pt_noise
    obs_cam, obs_pt, obs_xy = [], [], []
    for c in range(C):
        for p in range(P):
            obs_cam.append(c)
            obs_pt.append(p)
            obs_xy.append(sc.obs[c][p])
    prob = build_problem(
        R0, cam0, pts0,
        np.array(obs_cam, np.int32), np.array(obs_pt, np.int32),
        np.array(obs_xy),
        est_focal=est_focal, est_distortion=est_distortion, **kw)
    return prob


def test_ba_zero_residual_at_truth(rng):
    sc = Scene(rng, num_cams=3, num_pts=60, k1=-0.05, k2=0.02)
    prob = make_problem(rng, sc)
    # Patch true distortion into cam0.
    cam0 = np.array(prob.cam0)
    cam0[:3, 7:9] = sc.k[:3]
    prob = prob._replace(cam0=jnp.asarray(cam0))
    cost = float(compute_cost(prob.cam0, prob.pts0, prob))
    assert cost < 1e-12


def test_ba_recovers_from_noise(rng):
    sc = Scene(rng, num_cams=4, num_pts=120)
    prob = make_problem(rng, sc, cam_noise=0.03, pt_noise=0.05,
                        est_distortion=False)
    res = run_ba(prob, max_iters=100)
    assert float(res.cost) < 1e-8 * float(res.initial_cost)
    # Perfect synthetic data -> essentially zero reprojection error.
    assert float(res.cost) < 1e-6


def test_ba_fixed_focal(rng):
    sc = Scene(rng, num_cams=3, num_pts=80)
    prob = make_problem(rng, sc, cam_noise=0.02, pt_noise=0.02,
                        est_focal=False, est_distortion=False)
    res = run_ba(prob, max_iters=80)
    # Focal must not move.
    assert np.allclose(np.asarray(res.cam)[:3, 6], sc.f[:3])
    assert float(res.cost) < 1e-6


def test_ba_focal_recovery(rng):
    # Start focal 5% off; BA should pull it back (gauge allows a global
    # scale, but with multiple cameras at the *same* true focal and full
    # shared structure the reprojection term fixes it).
    sc = Scene(rng, num_cams=4, num_pts=120)
    prob = make_problem(rng, sc, cam_noise=0.01, pt_noise=0.02,
                        est_distortion=False, f_guess=735.0)
    res = run_ba(prob, max_iters=120)
    f_est = np.asarray(res.cam)[:4, 6]
    assert float(res.cost) < 1e-4
    assert np.allclose(f_est, 700.0, rtol=5e-3)


def test_ba_motion_only(rng):
    sc = Scene(rng, num_cams=3, num_pts=80)
    prob = make_problem(rng, sc, cam_noise=0.02, pt_noise=0.0,
                        est_distortion=False)
    res = run_ba(prob, max_iters=60, fix_points=True)
    # Points fixed at ground truth -> cameras must land on ground truth.
    assert np.allclose(np.asarray(res.pts), np.asarray(prob.pts0))
    assert float(res.cost) < 1e-8
    for i in range(3):
        assert np.allclose(np.asarray(res.cam)[i, 0:3], sc.centers[i],
                           atol=1e-5)


def test_ba_fixed_cameras(rng):
    sc = Scene(rng, num_cams=3, num_pts=80)
    fixed = np.array([True, False, False])
    prob = make_problem(rng, sc, cam_noise=0.02, pt_noise=0.02,
                        est_distortion=False, fixed_cameras=fixed)
    res = run_ba(prob, max_iters=80)
    got = np.asarray(res.cam)[0]
    want = np.asarray(prob.cam0)[0]
    assert np.allclose(got[0:3], want[0:3])   # center unchanged
    assert np.allclose(np.asarray(res.R)[0], np.asarray(prob.R0)[0])
    assert float(res.cost) < 1e-6


def test_ba_focal_constraint(rng):
    # A strong focal prior pins the focal near the target even when the
    # starting value is off.
    sc = Scene(rng, num_cams=3, num_pts=60)
    C = 3
    cc = np.zeros((C, CNP)); cc[:, 6] = 1.0
    ct = np.zeros((C, CNP)); ct[:, 6] = 700.0
    cw = np.zeros((C, CNP)); cw[:, 6] = 1e6
    prob = make_problem(rng, sc, cam_noise=0.01, pt_noise=0.01,
                        est_distortion=False, f_guess=760.0,
                        cam_constrained=cc, cam_constraints=ct,
                        cam_weights=cw)
    res = run_ba(prob, max_iters=80)
    assert np.allclose(np.asarray(res.cam)[:3, 6], 700.0, atol=1.0)


def test_ba_with_distortion(rng):
    sc = Scene(rng, num_cams=4, num_pts=150, k1=-0.08, k2=0.03)
    prob = make_problem(rng, sc, cam_noise=0.01, pt_noise=0.02)
    res = run_ba(prob, max_iters=150)
    assert float(res.cost) < 1e-5
    k_est = np.asarray(res.cam)[:4, 7:9]
    assert np.allclose(k_est[:, 0], -0.08, atol=5e-3)
    assert np.allclose(k_est[:, 1], 0.03, atol=5e-3)


def test_ba_padding_invariance(rng):
    sc = Scene(rng, num_cams=3, num_pts=50)
    prob_a = make_problem(rng, sc, cam_noise=0.02, pt_noise=0.02,
                          est_distortion=False)
    rng2 = np.random.default_rng(0)
    prob_b = make_problem(np.random.default_rng(12345), sc,
                          cam_noise=0.0, pt_noise=0.0,
                          est_distortion=False,
                          pad_cams=8, pad_pts=64, pad_obs=256, max_views=4)
    res_b = run_ba(prob_b, max_iters=30)
    # Padded problem with exact init stays at (numerical) zero cost and
    # padding slots remain untouched.
    assert float(res_b.cost) < 1e-10
    assert np.allclose(np.asarray(res_b.cam)[3:, 0:3], 0.0)


def test_camera_refine(rng):
    sc = Scene(rng, num_cams=1, num_pts=60)
    w = rng.normal(size=3) * 0.02
    R0 = np.asarray(rodrigues(jnp.asarray(w))) @ sc.R[0]
    cam0 = np.zeros(CNP)
    cam0[0:3] = sc.centers[0] + rng.normal(size=3) * 0.05
    cam0[6] = 690.0
    cam, R, cost = camera_refine(
        jnp.asarray(cam0), jnp.asarray(R0),
        jnp.asarray(sc.points), jnp.asarray(sc.obs[0]),
        jnp.ones(60, dtype=bool),
        True, False, 0.0, 0.0, 1e2, 80, 1e-3)
    assert float(cost) < 1e-6
    assert np.allclose(np.asarray(cam)[0:3], sc.centers[0], atol=1e-4)
    assert np.asarray(cam)[6] == pytest.approx(700.0, rel=1e-3)
    assert np.allclose(np.asarray(R), sc.R[0], atol=1e-4)


def test_ba_huber_robust_to_outliers(rng):
    # Corrupt a few observations with gross errors; Huber(25) should still
    # converge to the truth where L2 gets dragged (src/BundleCeres.cpp:125).
    sc = Scene(rng, num_cams=4, num_pts=120)
    prob = make_problem(rng, sc, cam_noise=0.02, pt_noise=0.03,
                        est_distortion=False)
    oxy = np.array(prob.obs_xy)
    n_bad = 12
    bad = rng.choice(len(oxy), size=n_bad, replace=False)
    oxy[bad] += rng.normal(size=(n_bad, 2)) * 200.0
    prob = prob._replace(obs_xy=jnp.asarray(oxy))

    res_l2 = run_ba(prob, max_iters=80)
    res_h = run_ba(prob, max_iters=80, loss="huber", huber_param=25.0)

    def inlier_rms(res):
        from bundler_sfm_tpu.ops.projection import project_obs
        pred = np.asarray(project_obs(
            res.cam, res.R, res.pts, prob.obs_cam, prob.obs_pt))
        d = np.linalg.norm(pred - oxy, axis=1)
        mask = np.ones(len(oxy), bool)
        mask[bad] = False
        return float(np.sqrt(np.mean(d[mask] ** 2)))

    # Huber bounds (not zeroes) outlier influence: expect a large
    # improvement over L2, not perfection (12 outliers @ ~200px).
    assert inlier_rms(res_h) < 5.0
    assert inlier_rms(res_h) < 0.25 * inlier_rms(res_l2)


def test_ba_cg_solver_matches_cholesky(rng):
    sc = Scene(rng, num_cams=5, num_pts=100)
    prob = make_problem(rng, sc, cam_noise=0.02, pt_noise=0.03,
                        est_distortion=False)
    res_chol = run_ba(prob, max_iters=60)
    res_cg = run_ba(prob, max_iters=60, solver="cg")
    # Both reach the same (zero-residual) optimum on clean data.
    assert float(res_cg.cost) < 1e-6
    assert np.allclose(np.asarray(res_cg.cam)[:5, 6],
                       np.asarray(res_chol.cam)[:5, 6], rtol=1e-4)


def test_linearize_obs_matches_autodiff(rng):
    """The closed-form Jacobian blocks (A [O,2,9], B [O,2,3]) must equal
    per-observation jacfwd of project_one at a generic state (nonzero w,
    distortion on)."""
    from bundler_sfm_tpu.ops.ba import _linearize_obs
    from bundler_sfm_tpu.ops.projection import project_one

    sc = Scene(rng, num_cams=3, num_pts=20)
    prob = make_problem(rng, sc, cam_noise=0.02, pt_noise=0.03)
    C = prob.cam0.shape[0]
    cam = np.asarray(prob.cam0).copy()
    cam[:, 3:6] = rng.normal(size=(C, 3)) * 0.05   # generic w
    cam[:, 7] = 0.01
    cam[:, 8] = -0.002
    cam = jnp.asarray(cam)
    pts = prob.pts0

    r, A, B, _ms = _linearize_obs(cam, pts, prob)

    def one(ci, pi, xy, valid):
        def f(c, p):
            return project_one(c, prob.R0[ci], p)
        rr = f(cam[ci], pts[pi]) - xy
        Aa, Bb = jax.jacfwd(f, argnums=(0, 1))(cam[ci], pts[pi])
        m = jnp.where(valid, 1.0, 0.0)
        return rr * m, Aa * m, Bb * m

    r2, A2, B2 = jax.vmap(one)(prob.obs_cam, prob.obs_pt, prob.obs_xy,
                               prob.obs_valid)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r2),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A2),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(B), np.asarray(B2),
                               rtol=1e-7, atol=1e-8)


def test_ba_outlier_loop_removes_outliers(rng):
    """The fused device loop (run_ba_outlier_loop) reproduces RunSFM's
    re-bundle-until-clean behavior: outlier points are removed via the
    per-camera 1.2*2*p80 threshold and the survivors converge."""
    from bundler_sfm_tpu.ops.ba import build_cam_obs_table, run_ba_outlier_loop
    sc = Scene(rng, num_cams=4, num_pts=200, noise=0.5)
    C, P = 4, 200
    cam0 = np.zeros((C, CNP))
    R0 = np.stack(sc.R[:C])
    for i in range(C):
        cam0[i, 0:3] = sc.centers[i]
        cam0[i, 6] = sc.f[i]
    obs_cam, obs_pt, obs_xy = [], [], []
    for c in range(C):
        for p in range(P):
            obs_cam.append(c)
            obs_pt.append(p)
            obs_xy.append(sc.obs[c][p])
    obs_cam = np.array(obs_cam, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    obs_xy = np.array(obs_xy)
    # Corrupt every observation of 12 points (gross outliers).
    bad_pts = rng.choice(P, 12, replace=False)
    bad_sel = np.isin(obs_pt, bad_pts)
    obs_xy[bad_sel] += rng.uniform(60, 120, (bad_sel.sum(), 2))
    pts0 = sc.points + rng.normal(size=sc.points.shape) * 0.02
    prob = build_problem(R0, cam0, pts0, obs_cam, obs_pt, obs_xy,
                         est_distortion=False)
    cam_obs, cam_mask = build_cam_obs_table(obs_cam, obs_pt, C)
    res = run_ba_outlier_loop(
        prob, jnp.asarray(cam_obs), jnp.asarray(cam_mask), max_iters=60,
        min_outliers=2, min_points=8, max_passes=4)
    removed = np.asarray(res.pt_removed)
    # All corrupted points removed, hardly any clean ones.
    assert removed[bad_pts].all()
    assert removed.sum() <= 12 + 5
    assert int(res.passes) >= 2
    assert not bool(res.too_few)
    # Survivor observations converge to the noise floor.
    assert float(res.avg_dist) < 1.5
    # Stats parity: pass-0 per-camera obs counts = full obs; thresholds in
    # the [8, 16] clamp; histogram bins sum to the obs count.
    stats = np.asarray(res.stats)
    hist = np.asarray(res.hist)
    assert (stats[0, :, 0] == P).all()
    assert (stats[0, :, 3] >= 8.0 - 1e-9).all()
    assert (stats[0, :, 3] <= 16.0 + 1e-9).all()
    np.testing.assert_array_equal(hist[0].sum(axis=1), stats[0, :, 0])
    # Final obs_valid excludes exactly the removed points' observations
    # (slot layout: map flat obs order through slot_ids).
    from bundler_sfm_tpu.ops.ba import slot_ids
    M = prob.views_mask.shape[1]
    ov = np.asarray(res.obs_valid)[slot_ids(obs_pt, M)]
    assert not ov[np.isin(obs_pt, np.nonzero(removed)[0])].any()


def test_ba_outlier_loop_single_pass_no_removal(rng):
    from bundler_sfm_tpu.ops.ba import build_cam_obs_table, run_ba_outlier_loop
    sc = Scene(rng, num_cams=3, num_pts=80, noise=0.3)
    prob = make_problem(rng, sc, est_distortion=False)
    obs_cam = np.asarray(prob.obs_cam)
    obs_pt = np.asarray(prob.obs_pt)
    valid = np.asarray(prob.obs_valid)
    cam_obs, cam_mask = build_cam_obs_table(obs_cam[valid], obs_pt[valid], 3,
                                            max_views=prob.views_mask.shape[1])
    res = run_ba_outlier_loop(
        prob, jnp.asarray(cam_obs), jnp.asarray(cam_mask), max_iters=40,
        remove_outliers=False, max_passes=4)
    assert int(res.passes) == 1
    assert not np.asarray(res.pt_removed).any()
    assert np.asarray(res.obs_valid).all()
    # Matches the plain run_ba result on the same problem.
    ref = run_ba(prob, max_iters=40)
    np.testing.assert_allclose(np.asarray(res.cam), np.asarray(ref.cam),
                               rtol=1e-6, atol=1e-8)


def test_triggs_correction_huber_noop(rng):
    """For Huber (rho'' <= 0) Ceres's Triggs correction reduces to plain
    sqrt(rho') IRLS scaling (corrector.cc alpha=0 branch) — verify our
    corrected normal blocks still solve the robust problem and that the
    curvature helper matches the analytic rho''."""
    import jax.numpy as jnp
    from bundler_sfm_tpu.ops.ba import _robust_curvature, _robust_weight
    s = jnp.asarray([1.0, 100.0, 625.0, 1e4, 1e6])
    b = 625.0
    rho2 = np.asarray(_robust_curvature(s, "huber", b))
    # Analytic: 0 inside, -0.5 sqrt(b) s^-1.5 outside.
    want = np.where(np.asarray(s) <= b, 0.0,
                    -0.5 * np.sqrt(b) * np.asarray(s) ** -1.5)
    np.testing.assert_allclose(rho2, want, rtol=1e-12)
    assert (rho2 <= 0).all()


def test_run_ba_chunked_matches_fused(rng):
    """The resumable chunked LM driver replays the exact same iteration
    sequence as the single-program path (bitwise on CPU)."""
    from bundler_sfm_tpu.ops.ba import run_ba
    sc = Scene(rng, num_cams=4, num_pts=120, noise=0.4)
    prob = make_problem(rng, sc, est_distortion=True)
    a = run_ba(prob, max_iters=40, chunked=False)
    b = run_ba(prob, max_iters=40, chunked=True)
    assert int(a.iters) == int(b.iters)
    np.testing.assert_array_equal(np.asarray(a.cam), np.asarray(b.cam))
    np.testing.assert_array_equal(np.asarray(a.pts), np.asarray(b.pts))
    assert float(a.cost) == float(b.cost)


def test_run_ba_auto_dispatch_crosses_threshold(rng, monkeypatch):
    """With _FUSED_WORK_BUDGET forced down, run_ba's AUTO dispatch (no
    explicit `chunked=`) routes a problem through the chunked driver and
    still replays the identical iteration sequence (bitwise on CPU) —
    execution slicing must not change semantics (lib/sfm-driver/sfm.c:814
    runs one monolithic loop; our slicing is an implementation detail)."""
    import bundler_sfm_tpu.ops.ba as ba
    sc = Scene(rng, num_cams=5, num_pts=150, noise=0.4)
    prob = make_problem(rng, sc, est_distortion=True)
    a = ba.run_ba(prob, max_iters=40, chunked=False)
    calls = []
    orig = ba.run_ba_chunked

    def spy(*args, **kw):
        calls.append(1)
        return orig(*args, **kw)

    monkeypatch.setattr(ba, "run_ba_chunked", spy)
    monkeypatch.setattr(ba, "_FUSED_WORK_BUDGET", 1.0)
    b = ba.run_ba(prob, max_iters=40)
    assert calls, "auto dispatch did not route through the chunked driver"
    assert int(a.iters) == int(b.iters)
    np.testing.assert_array_equal(np.asarray(a.cam), np.asarray(b.cam))
    np.testing.assert_array_equal(np.asarray(a.pts), np.asarray(b.pts))
    assert float(a.cost) == float(b.cost)


def test_outlier_loop_chunked_matches_fused(rng):
    """Host-driven chunked outlier loop = fused device loop: same removals,
    cameras, stats, and pass count."""
    from bundler_sfm_tpu.ops.ba import (
        build_cam_obs_table, run_ba_outlier_loop,
        run_ba_outlier_loop_chunked,
    )
    sc = Scene(rng, num_cams=4, num_pts=150, noise=0.5)
    C, P = 4, 150
    cam0 = np.zeros((C, CNP))
    R0 = np.stack(sc.R[:C])
    for i in range(C):
        cam0[i, 0:3] = sc.centers[i]
        cam0[i, 6] = sc.f[i]
    obs_cam, obs_pt, obs_xy = [], [], []
    for c in range(C):
        for p in range(P):
            obs_cam.append(c)
            obs_pt.append(p)
            obs_xy.append(sc.obs[c][p])
    obs_cam = np.array(obs_cam, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    obs_xy = np.array(obs_xy)
    bad_pts = rng.choice(P, 10, replace=False)
    bad_sel = np.isin(obs_pt, bad_pts)
    obs_xy[bad_sel] += rng.uniform(60, 120, (bad_sel.sum(), 2))
    pts0 = sc.points + rng.normal(size=sc.points.shape) * 0.02
    prob = build_problem(R0, cam0, pts0, obs_cam, obs_pt, obs_xy,
                         est_distortion=False)
    cam_obs, cam_mask = build_cam_obs_table(obs_cam, obs_pt, C)
    kw = dict(max_iters=50, min_outliers=2, min_points=8, max_passes=4)
    a = run_ba_outlier_loop(prob, jnp.asarray(cam_obs),
                            jnp.asarray(cam_mask), **kw)
    b = run_ba_outlier_loop_chunked(prob, jnp.asarray(cam_obs),
                                    jnp.asarray(cam_mask), **kw)
    assert int(a.passes) == int(b.passes)
    np.testing.assert_array_equal(np.asarray(a.pt_removed),
                                  np.asarray(b.pt_removed))
    np.testing.assert_allclose(np.asarray(a.cam), np.asarray(b.cam),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(a.n_outliers),
                                  np.asarray(b.n_outliers))
    np.testing.assert_allclose(np.asarray(a.stats), np.asarray(b.stats),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(a.hist), np.asarray(b.hist))
    assert abs(float(a.avg_dist) - float(b.avg_dist)) < 1e-9


def _banded_problem(rng, C=24, P=300, views=6, n_wide=5, plan_kw=None):
    """Synthetic banded-covisibility problem + its window plan: each point
    sees `views` consecutive cameras; `n_wide` loop-closure points span the
    whole camera range (forcing the wide-remainder path)."""
    from bundler_sfm_tpu.ops import ba
    sc = Scene(rng, num_cams=C, num_pts=P)
    cam0 = np.zeros((C, CNP))
    R0 = np.stack(sc.R[:C])
    for i in range(C):
        cam0[i, 0:3] = sc.centers[i] + rng.normal(size=3) * 0.01
        cam0[i, 6] = sc.f[i]
    pts0 = sc.points + rng.normal(size=sc.points.shape) * 0.02
    obs_cam, obs_pt, obs_xy = [], [], []
    for p in range(P):
        if p < n_wide:
            cams = [0, C // 2, C - 1]
        else:
            c0 = int(rng.integers(0, C - views))
            cams = range(c0, c0 + views)
        for c in cams:
            obs_cam.append(c)
            obs_pt.append(p)
            obs_xy.append(sc.obs[c][p])
    obs_cam = np.array(obs_cam, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    obs_xy = np.array(obs_xy)
    M = int(np.bincount(obs_pt).max())
    plan = ba.plan_schur_windows(obs_cam, obs_pt, P, C, M,
                                 **(plan_kw or dict(min_cameras=8,
                                                    windows=(8,))))
    assert plan is not None
    row_of, schur_win, Wd, G, total = plan
    prob_full = build_problem(R0, cam0, pts0, obs_cam, obs_pt, obs_xy,
                              est_distortion=False)
    pts0_r = np.zeros((total, 3))
    pts0_r[row_of] = pts0
    prob_win = build_problem(R0, cam0, pts0_r, obs_cam, row_of[obs_pt],
                             obs_xy, est_distortion=False,
                             max_views=M, schur_win=schur_win)
    return prob_full, prob_win, row_of, Wd, G


def test_schur_windowed_assembly_matches_full(rng):
    """assemble_schur_off with covisibility windows reproduces the full-C
    assembly (same S_off/rhs, camera-indexed) including the wide-point
    remainder."""
    import jax.numpy as jnp
    from bundler_sfm_tpu.ops import ba
    prob_f, prob_w, row_of, Wd, G = _banded_problem(rng)
    C = prob_f.cam0.shape[0]

    def pieces(prob):
        U, V, W, g_c, g_p, _ = ba.build_normal_blocks(
            prob.cam0, prob.pts0, prob, False)
        mu = 1e-3
        Vinv = ba._inv3(V + (mu + 1e-12) * jnp.eye(3, dtype=V.dtype)[None])
        Vo = ba._pt_expand(Vinv, prob)
        Y = (W[:, :, :, None] * Vo[:, None, :, :]).sum(2)
        return Y, W, g_p

    Yf, Wf, gpf = pieces(prob_f)
    Sf, rf = ba.assemble_schur_off(Yf, Wf, gpf, prob_f, C)
    Yw, Ww, gpw = pieces(prob_w)
    Sw, rw = ba.assemble_schur_off(Yw, Ww, gpw, prob_w, C,
                                   window=Wd, group_pts=G)
    np.testing.assert_allclose(np.asarray(Sw), np.asarray(Sf),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(rw), np.asarray(rf),
                               rtol=1e-9, atol=1e-9)


def test_run_ba_windowed_matches_full(rng):
    """A full LM run with the windowed Schur assembly converges to the same
    cameras/points as the standard assembly."""
    from bundler_sfm_tpu.ops import ba
    prob_f, prob_w, row_of, Wd, G = _banded_problem(rng)
    a = ba.run_ba(prob_f, max_iters=30, chunked=False)
    b = ba.run_ba(prob_w, max_iters=30, chunked=False,
                  window=Wd, group_pts=G)
    assert int(a.iters) == int(b.iters)
    np.testing.assert_allclose(np.asarray(a.cam), np.asarray(b.cam),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(b.pts)[row_of],
                               np.asarray(a.pts)[:len(row_of)],
                               rtol=1e-6, atol=1e-8)
    assert float(a.cost) == pytest.approx(float(b.cost), rel=1e-9)


def test_outlier_loop_windowed_matches_full(rng):
    """The fused outlier loop with covisibility windows (windowed Schur +
    windowed expansions/reductions + windowed pass stats) reproduces the
    full-path removals and cameras."""
    from bundler_sfm_tpu.ops import ba
    prob_f, prob_w, row_of, Wd, G = _banded_problem(rng)
    C = prob_f.cam0.shape[0]
    # Outliers: corrupt a few points' observations in BOTH layouts.
    oxy_f = np.array(prob_f.obs_xy)
    oxy_w = np.array(prob_w.obs_xy)
    bad_pts = rng.choice(np.arange(20, 250), 12, replace=False)
    M = prob_f.views_mask.shape[1]
    for p in bad_pts:
        delta = rng.uniform(60, 120, 2)
        for k in range(M):
            if bool(prob_f.views_mask[p, k]):
                oxy_f[p * M + k] += delta
        rw = int(row_of[p])
        for k in range(M):
            if bool(prob_w.views_mask[rw, k]):
                oxy_w[rw * M + k] += delta
    prob_f = prob_f._replace(obs_xy=jnp.asarray(oxy_f))
    prob_w = prob_w._replace(obs_xy=jnp.asarray(oxy_w))
    co_f, cm_f = ba.build_cam_obs_table(
        np.asarray(prob_f.obs_cam)[np.asarray(prob_f.obs_valid)],
        np.asarray(prob_f.obs_pt)[np.asarray(prob_f.obs_valid)], C)
    # Rebuild tables from the ORIGINAL obs lists to keep slot ids aligned.
    kw = dict(max_iters=40, min_outliers=2, min_points=8, max_passes=3)
    a = ba.run_ba_outlier_loop(
        prob_f, jnp.asarray(co_f), jnp.asarray(cm_f), **kw)
    ov_w = np.asarray(prob_w.obs_valid)
    co_w, cm_w = ba.build_cam_obs_table(
        np.asarray(prob_w.obs_cam)[ov_w],
        np.asarray(prob_w.obs_pt)[ov_w], C,
        max_views=prob_w.views_mask.shape[1])
    b = ba.run_ba_outlier_loop(
        prob_w, jnp.asarray(co_w), jnp.asarray(cm_w),
        window=Wd, group_pts=G, **kw)
    assert int(a.passes) == int(b.passes)
    np.testing.assert_array_equal(
        np.asarray(a.pt_removed)[:len(row_of)],
        np.asarray(b.pt_removed)[row_of])
    np.testing.assert_allclose(np.asarray(a.cam), np.asarray(b.cam),
                               rtol=1e-6, atol=1e-8)


def test_run_ba_windowed_loop_closure_heavy(rng):
    """Hostile covisibility: 25 % of points are wide-span loop closures
    (sent to the full-C tail).  The windowed run must still match the full
    assembly exactly — the tail path is not a corner case here but a
    quarter of the problem.  (`lib/sba-1.5/sba.h:70-78` CRS vmask handles
    arbitrary sparsity; our windowed plan must too.)"""
    from bundler_sfm_tpu.ops import ba
    prob_f, prob_w, row_of, Wd, G = _banded_problem(rng, C=24, P=300,
                                                    n_wide=75)
    a = ba.run_ba(prob_f, max_iters=20, chunked=False)
    b = ba.run_ba(prob_w, max_iters=20, chunked=False,
                  window=Wd, group_pts=G)
    assert int(a.iters) == int(b.iters)
    np.testing.assert_allclose(np.asarray(a.cam), np.asarray(b.cam),
                               rtol=1e-7, atol=1e-9)
    assert float(a.cost) == pytest.approx(float(b.cost), rel=1e-9)


def test_plan_schur_windows_falls_back_when_wide_dominates(rng):
    """When wide-span (loop-closure) points dominate, the full-C tail would
    erase the windowed win — plan_schur_windows must return None so callers
    run the plain assembly (the round-2 cliff guard cannot silently
    reappear as a mostly-tail 'windowed' plan)."""
    from bundler_sfm_tpu.ops import ba
    C, P = 64, 400
    obs_cam, obs_pt = [], []
    n_wide = int(0.55 * P)
    for p in range(P):
        if p < n_wide:
            cams = [0, C // 2, C - 1]           # spans the full range
        else:
            c0 = int(rng.integers(0, C - 6))
            cams = range(c0, c0 + 6)
        for c in cams:
            obs_cam.append(c)
            obs_pt.append(p)
    obs_cam = np.array(obs_cam, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    M = int(np.bincount(obs_pt).max())
    plan = ba.plan_schur_windows(obs_cam, obs_pt, P, C, M,
                                 min_cameras=8, windows=(8, 16, 32))
    assert plan is None
    # Sanity: the same scene with narrow covisibility DOES get a plan.
    narrow_cam = np.where(obs_pt < n_wide,
                          (obs_pt % (C - 6)) + obs_cam % 3, obs_cam)
    plan2 = ba.plan_schur_windows(narrow_cam.astype(np.int32), obs_pt, P, C,
                                  M, min_cameras=8, windows=(8, 16, 32))
    assert plan2 is not None


# --------------------------------------------------------------------------
# View-count-bucketed slot layout (the mixed-track-density regime where a
# single M = max-track-length pads ~80% dead slots; sba's CRS stores exactly
# the real observations, lib/sba-1.5/sba_levmar.c:1191-1324)
# --------------------------------------------------------------------------


def _mixed_track_problem(rng, C=16, P=500, noise=0.4, outlier_pts=0):
    """Scene with explicitly mixed track lengths (60% short / 25% mid /
    15% long) — the realistic density the single-M layout pads away."""
    from tests.synthetic import Scene
    sc = Scene(rng, num_cams=C, num_pts=P, noise=noise)
    u = rng.random(P)
    nviews = np.where(u < 0.6, rng.integers(2, 5, P),
                      np.where(u < 0.85, rng.integers(5, 9, P),
                               rng.integers(9, C + 1, P)))
    obs_cam, obs_pt = [], []
    for p in range(P):
        for c in np.sort(rng.choice(C, nviews[p], replace=False)):
            obs_cam.append(c)
            obs_pt.append(p)
    obs_cam = np.array(obs_cam, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    obs_xy = np.stack([sc.obs[c][p] for c, p in zip(obs_cam, obs_pt)])
    if outlier_pts:
        bad = rng.choice(P, outlier_pts, replace=False)
        sel = np.isin(obs_pt, bad)
        obs_xy[sel] += rng.uniform(60, 120, (sel.sum(), 2))
    cam0 = np.zeros((C, CNP))
    R0 = np.stack(sc.R[:C])
    for i in range(C):
        cam0[i, 0:3] = sc.centers[i] + rng.normal(size=3) * 0.01
        cam0[i, 6] = sc.f[i]
    pts0 = sc.points + rng.normal(size=sc.points.shape) * 0.02
    return R0, cam0, pts0, obs_cam, obs_pt, obs_xy


def test_plan_view_buckets_invariants(rng):
    from bundler_sfm_tpu.ops.ba import plan_view_buckets, _quant_rows
    P = 700
    nviews = np.clip((rng.pareto(1.5, P) * 3 + 2).astype(int), 1, 30)
    obs_pt = np.repeat(np.arange(P, dtype=np.int32), nviews)
    plan = plan_view_buckets(obs_pt, P, min_total_obs=1)
    assert plan is not None
    row_of, buckets, n_rows = plan
    # row_of is injective into [0, n_rows); widths ascend; counts fit.
    assert len(np.unique(row_of)) == P
    assert row_of.min() >= 0 and row_of.max() < n_rows
    widths = [m for _, m in buckets]
    assert widths == sorted(widths)
    assert n_rows == sum(pb for pb, _ in buckets)
    pt_lo = np.cumsum([0] + [pb for pb, _ in buckets])
    counts = np.bincount(obs_pt, minlength=P)
    for k, (pb, mb) in enumerate(buckets):
        sel = (row_of >= pt_lo[k]) & (row_of < pt_lo[k + 1])
        assert counts[sel].max() <= mb
        # quantized row counts come from the 1.5-step grid with ~20%
        # growth headroom (sticky-plan reuse across registration rounds)
        assert pb == _quant_rows(int(sel.sum() * 1.2) + 1)
        assert pb >= sel.sum()
    # Bucketed slots beat the single layout by the required factor.
    single = _quant_rows(P) * (1 << int(np.ceil(np.log2(counts.max()))))
    assert single > 1.3 * sum(pb * mb for pb, mb in buckets)
    # Uniform track lengths: not worth it -> None.
    obs_u = np.repeat(np.arange(P, dtype=np.int32), 8)
    assert plan_view_buckets(obs_u, P, min_total_obs=1) is None


def test_ba_view_buckets_match_single(rng):
    """run_ba over the bucketed layout reproduces the single-M result."""
    from bundler_sfm_tpu.ops.ba import plan_view_buckets
    R0, cam0, pts0, obs_cam, obs_pt, obs_xy = _mixed_track_problem(rng)
    P = len(pts0)
    prob1 = build_problem(R0, cam0, pts0, obs_cam, obs_pt, obs_xy,
                          est_distortion=False)
    res1 = run_ba(prob1, max_iters=30)
    row_of, buckets, n_rows = plan_view_buckets(obs_pt, P, min_total_obs=1)
    assert len(buckets) > 1
    pts_r = np.zeros((n_rows, 3))
    pts_r[row_of] = pts0
    prob2 = build_problem(R0, cam0, pts_r, obs_cam,
                          row_of[obs_pt].astype(np.int32), obs_xy,
                          est_distortion=False, view_buckets=buckets)
    res2 = run_ba(prob2, max_iters=30)
    # Summation order differs across layouts (f64 rounding), so the LM may
    # terminate an iteration or two apart — compare the converged model.
    np.testing.assert_allclose(float(res1.cost), float(res2.cost),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res1.cam), np.asarray(res2.cam),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res1.pts)[:P],
                               np.asarray(res2.pts)[row_of],
                               rtol=1e-4, atol=1e-5)


def test_ba_outlier_loop_view_buckets_match(rng):
    """The fused outlier loop under the bucketed layout removes the same
    points, produces the same stats, and converges to the same model."""
    from bundler_sfm_tpu.ops.ba import (
        build_cam_obs_table, plan_view_buckets, run_ba_outlier_loop,
    )
    R0, cam0, pts0, obs_cam, obs_pt, obs_xy = _mixed_track_problem(
        rng, outlier_pts=10)
    C, P = len(cam0), len(pts0)
    kw = dict(max_iters=30, min_outliers=2, min_points=8, max_passes=4)
    prob1 = build_problem(R0, cam0, pts0, obs_cam, obs_pt, obs_xy,
                          est_distortion=False)
    co1, cm1 = build_cam_obs_table(obs_cam, obs_pt, C)
    res1 = run_ba_outlier_loop(prob1, jnp.asarray(co1), jnp.asarray(cm1),
                               **kw)
    row_of, buckets, n_rows = plan_view_buckets(obs_pt, P, min_total_obs=1)
    pts_r = np.zeros((n_rows, 3))
    pts_r[row_of] = pts0
    op2 = row_of[obs_pt].astype(np.int32)
    prob2 = build_problem(R0, cam0, pts_r, obs_cam, op2, obs_xy,
                          est_distortion=False, view_buckets=buckets)
    co2, cm2 = build_cam_obs_table(obs_cam, op2, C, view_buckets=buckets)
    res2 = run_ba_outlier_loop(prob2, jnp.asarray(co2), jnp.asarray(cm2),
                               **kw)
    assert int(res1.passes) == int(res2.passes)
    np.testing.assert_array_equal(np.asarray(res1.n_outliers),
                                  np.asarray(res2.n_outliers))
    r1 = np.asarray(res1.pt_removed)[:P]
    np.testing.assert_array_equal(r1, np.asarray(res2.pt_removed)[row_of])
    np.testing.assert_allclose(np.asarray(res1.stats),
                               np.asarray(res2.stats), rtol=1e-6, atol=1e-6)
    keep = ~r1
    np.testing.assert_allclose(np.asarray(res1.pts)[:P][keep],
                               np.asarray(res2.pts)[row_of][keep],
                               rtol=1e-6, atol=1e-7)


def test_build_problem_bucketed_rejects_schur_win(rng):
    from bundler_sfm_tpu.ops.ba import build_problem as bp
    R0 = np.stack([np.eye(3)] * 2)
    cam0 = np.zeros((2, CNP)); cam0[:, 6] = 700.0
    pts0 = np.zeros((4, 3))
    oc = np.array([0, 1, 0, 1], np.int32)
    op = np.array([0, 0, 1, 1], np.int32)
    oxy = np.zeros((4, 2))
    with pytest.raises(ValueError):
        bp(R0, cam0, pts0, oc, op, oxy, view_buckets=((4, 4),),
           schur_win=np.zeros(1, np.int32))


def test_plan_view_buckets_sticky_reuse(rng):
    """An incremental round with a few more points must REUSE the previous
    bucket structure (same static shape, no recompile); a much larger
    problem must re-plan."""
    from bundler_sfm_tpu.ops.ba import plan_view_buckets
    P = 900
    nviews = np.clip((rng.pareto(1.5, P) * 3 + 2).astype(int), 1, 30)
    obs_pt = np.repeat(np.arange(P, dtype=np.int32), nviews)
    row_of, buckets, n_rows = plan_view_buckets(obs_pt, P, min_total_obs=1)
    # +5% points with the same distribution: fits the headroom -> same plan.
    P2 = int(P * 1.05)
    nv2 = np.concatenate([nviews, nviews[:P2 - P]])
    op2 = np.repeat(np.arange(P2, dtype=np.int32), nv2)
    plan2 = plan_view_buckets(op2, P2, min_total_obs=1, prev=buckets)
    assert plan2 is not None and plan2[1] == buckets
    # row_of still a valid injection with in-bucket widths respected.
    r2 = plan2[0]
    assert len(np.unique(r2)) == P2
    # 4x the points: overflow -> fresh plan with larger buckets.
    P3 = 4 * P
    nv3 = np.tile(nviews, 4)
    op3 = np.repeat(np.arange(P3, dtype=np.int32), nv3)
    plan3 = plan_view_buckets(op3, P3, min_total_obs=1, prev=buckets)
    assert plan3 is not None and plan3[1] != buckets
