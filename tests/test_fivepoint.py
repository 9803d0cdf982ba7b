import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.synthetic import Scene

from bundler_sfm_tpu.ops.fivepoint import (
    compute_pose_ransac_5pt, estimate_pose_5point, generate_ematrix_hypotheses,
)


def true_essential(sc):
    R_rel = sc.R[1] @ sc.R[0].T
    t_rel = -R_rel @ (sc.R[0] @ (sc.centers[1] - sc.centers[0]))
    tx = np.array([[0, -t_rel[2], t_rel[1]],
                   [t_rel[2], 0, -t_rel[0]],
                   [-t_rel[1], t_rel[0], 0]])
    E = tx @ R_rel
    return E / np.linalg.norm(E), R_rel


def test_minimal_solver_exact(rng):
    sc = Scene(rng, num_cams=2, num_pts=60, noise=0.0)
    f = sc.f[0]
    q1 = -sc.obs[0] / f
    q2 = -sc.obs[1] / f
    idx = np.array([3, 10, 22, 37, 51])
    Es, ok = generate_ematrix_hypotheses(jnp.asarray(q1[idx]),
                                         jnp.asarray(q2[idx]))
    Es, ok = np.asarray(Es), np.asarray(ok)
    assert ok.sum() >= 1
    h1 = np.concatenate([q1, np.ones((60, 1))], 1)
    h2 = np.concatenate([q2, np.ones((60, 1))], 1)
    best = np.inf
    for h in range(10):
        if not ok[h]:
            continue
        res = np.abs(np.einsum("ni,ij,nj->n", h2, Es[h], h1)).max()
        best = min(best, res)
    # The true E is among the hypotheses (all-point residual ~ 0).
    assert best < 1e-8


def test_pose_ransac_with_outliers(rng):
    sc = Scene(rng, num_cams=2, num_pts=120, noise=0.3)
    f = sc.f[0]
    x1 = sc.obs[0].copy()
    x2 = sc.obs[1].copy()
    bad = rng.choice(120, 30, replace=False)
    x2[bad] += rng.normal(size=(30, 2)) * 100.0
    pad = 128
    x1p = np.zeros((pad, 2)); x1p[:120] = x1
    x2p = np.zeros((pad, 2)); x2p[:120] = x2
    R, t, cnt, ok = estimate_pose_5point(
        jax.random.PRNGKey(5), jnp.asarray(x1p), jnp.asarray(x2p),
        jnp.int32(120), f, f, jnp.float64(2.25), num_rounds=256)
    assert bool(ok)
    assert int(cnt) > 70
    _, R_rel = true_essential(sc)
    assert np.abs(np.asarray(R) - R_rel).max() < 2e-3
    c_rel = sc.R[0] @ (sc.centers[1] - sc.centers[0])
    c_est = np.asarray(-np.asarray(R).T @ np.asarray(t))
    cos = c_est @ c_rel / np.linalg.norm(c_est) / np.linalg.norm(c_rel)
    assert cos > 0.9999
