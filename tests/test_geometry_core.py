import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bundler_sfm_tpu.ops.rotations import (
    rodrigues, rot_update, log_rotation, rq3, fix_intrinsics_sign, skew,
)
from bundler_sfm_tpu.ops.projection import (
    project_one, pack_camera, invert_distortion, undistort_normalized,
    ray_angle, check_cheirality,
)


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2*(y*y + z*z), 2*(x*y - w*z), 2*(x*z + w*y)],
        [2*(x*y + w*z), 1 - 2*(x*x + z*z), 2*(y*z - w*x)],
        [2*(x*z - w*y), 2*(y*z + w*x), 1 - 2*(x*x + y*y)],
    ])


def test_rodrigues_identity():
    R = rodrigues(jnp.zeros(3))
    assert np.allclose(R, np.eye(3), atol=1e-12)


def test_rodrigues_axis_angle():
    # 90 degrees about z
    R = np.asarray(rodrigues(jnp.array([0.0, 0.0, np.pi / 2])))
    want = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    assert np.allclose(R, want, atol=1e-12)


def test_rodrigues_log_roundtrip(rng):
    for _ in range(10):
        w = rng.normal(size=3) * 0.8
        R = rodrigues(jnp.asarray(w))
        w2 = np.asarray(log_rotation(R))
        assert np.allclose(w, w2, atol=1e-9)


def test_rodrigues_grad_at_zero():
    # Jacobian of R(w) at w=0 equals the skew generator: dR/dw_i = [e_i]x.
    J = jax.jacfwd(rodrigues)(jnp.zeros(3))
    for i in range(3):
        e = np.zeros(3)
        e[i] = 1.0
        assert np.allclose(J[..., i], np.asarray(skew(jnp.asarray(e))), atol=1e-8)


def test_rq3(rng):
    for _ in range(10):
        K = np.triu(rng.normal(size=(3, 3)))
        K[np.diag_indices(3)] = np.abs(K[np.diag_indices(3)]) + 0.5
        Q = random_rotation(rng)
        M = K @ Q
        K2, Q2 = rq3(jnp.asarray(M))
        K2, Q2 = fix_intrinsics_sign(K2, Q2)
        K2, Q2 = np.asarray(K2), np.asarray(Q2)
        assert np.allclose(K2 @ Q2, M, atol=1e-9)
        assert np.allclose(np.tril(K2, -1), 0.0, atol=1e-9)
        assert np.allclose(Q2 @ Q2.T, np.eye(3), atol=1e-9)
        assert np.linalg.det(Q2) == pytest.approx(1.0, abs=1e-9)
        assert np.all(np.diag(K2) > 0)


def test_projection_matches_reference_model(rng):
    """Check against a literal transcription of snavely_reprojection_error.h.

    The reference residual uses angle-axis + translation t with p = R·X + t;
    our state is (R0, w, center) with p = R(X - c); they agree when
    t = -R·c."""
    for _ in range(5):
        R = random_rotation(rng)
        c = rng.normal(size=3)
        X = rng.normal(size=3) + np.array([0, 0, 10.0])
        f, k1, k2 = 700.0, -0.05, 0.02
        cam = pack_camera(c, np.zeros(3), f, np.array([k1, k2]))
        got = np.asarray(project_one(jnp.asarray(cam), jnp.asarray(R),
                                     jnp.asarray(X)))
        # Reference: p = R X + t, xp = -p0/p2, distortion, times f.
        t = -R @ c
        p = R @ X + t
        xp, yp = -p[0] / p[2], -p[1] / p[2]
        r2 = xp * xp + yp * yp
        dist = 1.0 + r2 * (k1 + k2 * r2)
        want = np.array([f * dist * xp, f * dist * yp])
        assert np.allclose(got, want, atol=1e-9)


def test_projection_with_rotation_update(rng):
    R0 = random_rotation(rng)
    w = rng.normal(size=3) * 0.1
    c = rng.normal(size=3)
    X = np.array([0.3, -0.2, 8.0])
    cam = pack_camera(c, w, 500.0, np.zeros(2))
    got = np.asarray(project_one(jnp.asarray(cam), jnp.asarray(R0), jnp.asarray(X)))
    R = np.asarray(rodrigues(jnp.asarray(w))) @ R0
    cam2 = pack_camera(c, np.zeros(3), 500.0, np.zeros(2))
    want = np.asarray(project_one(jnp.asarray(cam2), jnp.asarray(R), jnp.asarray(X)))
    assert np.allclose(got, want, atol=1e-9)


def test_cheirality():
    R = np.eye(3)
    c = np.zeros(3)
    # Camera looks down -z: points with negative z are in front.
    assert bool(check_cheirality(jnp.array([0.0, 0.0, -5.0]), jnp.asarray(R),
                                 jnp.asarray(c)))
    assert not bool(check_cheirality(jnp.array([0.0, 0.0, 5.0]), jnp.asarray(R),
                                     jnp.asarray(c)))


def test_invert_distortion_roundtrip():
    f, k1, k2 = 700.0, -0.08, 0.03
    k_inv = invert_distortion(k1, k2, f, 640, 480)
    # Forward-distort some normalized points, then undo.
    u = jnp.array([[0.1, 0.05], [0.3, -0.2], [0.0, 0.35]])
    rsq = jnp.sum(u * u, axis=1)
    factor = 1.0 + k1 * rsq + k2 * rsq * rsq
    u_dist = u * factor[:, None]
    u_back = undistort_normalized(u_dist, k_inv)
    assert np.allclose(np.asarray(u_back), np.asarray(u), atol=2e-4)


def test_ray_angle():
    R = jnp.eye(3)
    f = 500.0
    # Two cameras at different positions looking at the same point produce
    # rays whose angle matches simple geometry; same camera, same pixel -> 0.
    a = ray_angle(jnp.array([0.0, 0.0]), f, R, jnp.array([0.0, 0.0]), f, R)
    assert float(a) < 1e-3
    b = ray_angle(jnp.array([0.0, 0.0]), f, R, jnp.array([500.0, 0.0]), f, R)
    assert float(b) == pytest.approx(np.pi / 4, abs=1e-6)


def test_eigh3x3_matches_lapack(rng):
    """Closed-form symmetric 3x3 eigendecomposition vs numpy across random,
    near-degenerate, and isotropic matrices."""
    from bundler_sfm_tpu.ops.svd_utils import eigh3x3
    mats = []
    for _ in range(200):
        B = rng.normal(size=(3, 3))
        mats.append(B @ B.T)
    # Repeated-eigenvalue and isotropic cases.
    mats.append(np.eye(3))
    mats.append(np.diag([2.0, 2.0, 5.0]))
    mats.append(np.diag([3.0, 1e-12, 1e-12]))
    mats.append(np.zeros((3, 3)))
    A = np.stack(mats)
    w, V = jax.jit(jax.vmap(lambda a: __import__(
        "bundler_sfm_tpu.ops.svd_utils", fromlist=["eigh3x3"]).eigh3x3(a)))(
            jnp.asarray(A))
    w = np.asarray(w)
    V = np.asarray(V)
    for t in range(len(mats)):
        wt, Vt = np.linalg.eigh(A[t])
        scale = max(abs(wt[2]), 1.0)
        np.testing.assert_allclose(w[t], wt, atol=1e-8 * scale)
        # Columns are unit, mutually orthogonal, and satisfy A v = w v.
        G = V[t].T @ V[t]
        np.testing.assert_allclose(G, np.eye(3), atol=1e-7)
        for k in range(3):
            np.testing.assert_allclose(A[t] @ V[t][:, k], w[t, k] * V[t][:, k],
                                       atol=1e-6 * scale)


def test_smallest_eigvec_psd(rng):
    """Inverse-iteration smallest eigenvector vs numpy on well-conditioned
    12x12 PSD matrices (the normalized-DLT regime it serves)."""
    from bundler_sfm_tpu.ops.svd_utils import smallest_eigvec_psd
    for _ in range(30):
        B = rng.normal(size=(24, 12))
        A = B.T @ B
        # Push the smallest eigenvalue well below the rest.
        w, V = np.linalg.eigh(A)
        A2 = A - (w[0] - 1e-6 * w[-1]) * np.outer(V[:, 0], V[:, 0])
        v = np.asarray(smallest_eigvec_psd(jnp.asarray(A2)))
        wt, Vt = np.linalg.eigh(A2)
        assert abs(v @ Vt[:, 0]) > 1 - 1e-6
