import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.synthetic import Scene, project, random_rotation

from bundler_sfm_tpu.ops.fmatrix import (
    estimate_fmatrix_ransac, estimate_ematrix, fmatrix_residual,
)
from bundler_sfm_tpu.ops.homography import (
    estimate_homography_ransac, homography_transfer_dist,
)
from bundler_sfm_tpu.ops.resection import find_and_verify_camera, find_projection_ransac
from bundler_sfm_tpu.ops.triangulate import (
    triangulate_two_view, triangulate_tracks_pixels,
)
from bundler_sfm_tpu.ops.essential import (
    decompose_essential, decompose_essential_multipt, pose_to_center,
)
from bundler_sfm_tpu.ops.fmatrix import fmatrix_residual as fres

KEY = jax.random.PRNGKey(7)


def pad2(x, n):
    out = np.zeros((n, x.shape[1]), dtype=np.float64)
    out[:len(x)] = x
    return out


def corrupt(rng, xy, frac, scale=80.0):
    xy = xy.copy()
    n_bad = int(len(xy) * frac)
    bad = rng.choice(len(xy), n_bad, replace=False)
    xy[bad] += rng.normal(size=(n_bad, 2)) * scale
    return xy, bad


def test_fmatrix_ransac_outliers(rng):
    sc = Scene(rng, num_cams=2, num_pts=300, noise=0.2)
    x1, x2 = sc.obs[0], sc.obs[1]
    x2_bad, bad = corrupt(rng, x2, 0.3)
    n = len(x1)
    F, inl, cnt = estimate_fmatrix_ransac(
        KEY, jnp.asarray(pad2(x1, 512)), jnp.asarray(pad2(x2_bad, 512)),
        jnp.int32(n), jnp.float64(9.0), num_rounds=512)
    inl = np.asarray(inl)[:n]
    # Epipolar constraint holds for the clean points.
    good = np.setdiff1d(np.arange(n), bad)
    assert inl[good].mean() > 0.95
    assert inl[bad].mean() < 0.2
    # Residuals of clean points are small.
    res = np.asarray(fmatrix_residual(F, jnp.asarray(x2), jnp.asarray(x1)))
    assert np.median(res[good]) < 2.0


def test_ematrix_known_focal(rng):
    sc = Scene(rng, num_cams=2, num_pts=250, noise=0.0)
    x1, x2 = sc.obs[0], sc.obs[1]
    n = len(x1)
    E, F, inl, cnt = estimate_ematrix(
        KEY, jnp.asarray(pad2(x1, 256)), jnp.asarray(pad2(x2, 256)),
        jnp.int32(n), sc.f[0], sc.f[1], jnp.float64(81.0), num_rounds=512)
    assert int(cnt) > 0.9 * n
    # E has two equal singular values and one zero.
    s = np.linalg.svd(np.asarray(E), compute_uv=False)
    assert s[2] < 1e-6 * s[0]
    assert abs(s[0] - s[1]) < 1e-6 * s[0]
    # Pose recovery from E: inputs are NEGATED normalized (ray) coords.
    p1r = -x1 / sc.f[0]
    p2r = -x2 / sc.f[1]
    R, t, ok = decompose_essential(E, jnp.asarray(p1r[0]), jnp.asarray(p2r[0]))
    assert bool(ok)
    # Ground truth relative pose (camera 1 frame = world).
    R_rel = sc.R[1] @ sc.R[0].T
    c_rel = sc.R[0] @ (sc.centers[1] - sc.centers[0])
    assert np.allclose(np.asarray(R), R_rel, atol=1e-3)
    c_est = np.asarray(pose_to_center(R, t))
    cos = c_est @ c_rel / (np.linalg.norm(c_est) * np.linalg.norm(c_rel))
    assert cos > 0.9999  # translation up to scale

    # Multi-point voting variant agrees.
    mask = np.zeros(256, dtype=bool)
    mask[:n] = True
    R2, t2, ok2 = decompose_essential_multipt(
        E, jnp.asarray(pad2(p1r, 256)), jnp.asarray(pad2(p2r, 256)),
        jnp.asarray(mask))
    assert bool(ok2)
    assert np.allclose(np.asarray(R2), R_rel, atol=1e-3)

    # The pixel-space F is consistent with the correspondences.
    resF = np.asarray(fres(F, jnp.asarray(x2), jnp.asarray(x1)))
    assert np.median(resF) < 1.0


def test_homography_ransac(rng):
    # A plane scene induces an exact homography between views.
    H_true = np.array([[1.1, 0.02, 5.0], [-0.03, 0.95, -7.0], [1e-4, -2e-5, 1.0]])
    p1 = rng.uniform(-300, 300, (200, 2))
    ph = np.concatenate([p1, np.ones((200, 1))], axis=1) @ H_true.T
    p2 = ph[:, :2] / ph[:, 2:3]
    p2_bad, bad = corrupt(rng, p2, 0.25)
    H, inl, cnt = estimate_homography_ransac(
        KEY, jnp.asarray(pad2(p1, 256)), jnp.asarray(pad2(p2_bad, 256)),
        jnp.int32(200), jnp.float64(6.0), num_rounds=256)
    good = np.setdiff1d(np.arange(200), bad)
    d = np.asarray(homography_transfer_dist(H, jnp.asarray(p1), jnp.asarray(p2)))
    assert np.median(d[good]) < 0.5
    assert np.asarray(inl)[:200][good].mean() > 0.9


def test_resection(rng):
    sc = Scene(rng, num_cams=1, num_pts=120, noise=0.0)
    X = sc.points
    x = sc.obs[0]
    x_bad, bad = corrupt(rng, x, 0.2)
    cam = find_and_verify_camera(
        KEY, jnp.asarray(pad2(X, 128)), jnp.asarray(pad2(x_bad, 128)),
        jnp.int32(120), jnp.float64(4.0), jnp.float64(64.0), num_rounds=1024)
    assert bool(cam.ok)
    R, t = np.asarray(cam.R), np.asarray(cam.t)
    K = np.asarray(cam.K)
    center = -R.T @ t
    assert np.allclose(center, sc.centers[0], atol=1e-2)
    assert np.allclose(R, sc.R[0], atol=1e-2)
    assert K[0, 0] == pytest.approx(sc.f[0], rel=0.02)
    good = np.setdiff1d(np.arange(120), bad)
    assert np.asarray(cam.inliers)[:120][good].mean() > 0.95


def test_triangulate_two_view(rng):
    sc = Scene(rng, num_cams=2, num_pts=50, noise=0.0)
    i = 7
    p_n = sc.obs[0][i] / sc.f[0]
    q_n = sc.obs[1][i] / sc.f[1]
    X, err = triangulate_two_view(
        jnp.asarray(-p_n), jnp.asarray(-q_n),
        jnp.asarray(sc.R[0]), jnp.asarray(sc.w2c_t(0)),
        jnp.asarray(sc.R[1]), jnp.asarray(sc.w2c_t(1)))
    assert np.allclose(np.asarray(X), sc.points[i], atol=1e-6)
    assert float(err) < 1e-8


def test_triangulate_tracks_pixels(rng):
    sc = Scene(rng, num_cams=4, num_pts=40, noise=0.0, k1=-0.05, k2=0.02)
    T, M = 40, 4
    xy = np.stack([np.stack([sc.obs[c][t] for c in range(M)]) for t in range(T)])
    fs = np.broadcast_to(sc.f, (T, M)).copy()
    ks = np.broadcast_to(sc.k, (T, M, 2)).copy()
    Rs = np.broadcast_to(sc.R, (T, M, 3, 3)).copy()
    cs = np.broadcast_to(sc.centers, (T, M, 3)).copy()
    mask = np.ones((T, M), dtype=bool)
    # Pad one extra view slot to exercise masking.
    xy = np.concatenate([xy, np.zeros((T, 1, 2))], axis=1)
    fs = np.concatenate([fs, np.ones((T, 1))], axis=1)
    ks = np.concatenate([ks, np.zeros((T, 1, 2))], axis=1)
    Rs = np.concatenate([Rs, np.broadcast_to(np.eye(3), (T, 1, 3, 3))], axis=1)
    cs = np.concatenate([cs, np.zeros((T, 1, 3))], axis=1)
    mask = np.concatenate([mask, np.zeros((T, 1), dtype=bool)], axis=1)
    X, err = triangulate_tracks_pixels(
        jnp.asarray(xy), jnp.asarray(fs), jnp.asarray(ks), jnp.asarray(Rs),
        jnp.asarray(cs), jnp.asarray(mask))
    assert np.allclose(np.asarray(X), sc.points, atol=2e-3)
    assert np.max(np.asarray(err)) < 0.1
