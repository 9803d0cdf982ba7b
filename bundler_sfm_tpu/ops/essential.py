"""Essential-matrix decomposition into relative pose.

Reference `find_extrinsics_essential` / `find_extrinsics_essential_multipt`
(`lib/imagelib/triangulate.c`): E = U diag(1,1,0) Vᵀ gives two rotations
Ra = U D Vᵀ, Rb = U Dᵀ Vᵀ (det fixed to +1) and translation ±u3; the correct
(R, t) of the four is picked by triangulating correspondences and requiring
NEGATIVE depth in both views (the -z axis convention, `src/Bundle.cpp:177`).

Coordinate contract (matches `compute_pose_ransac`, `lib/5point/5point.c`):
all points passed here are NEGATED normalized coords (-u/f, -v/f) — true ray
coordinates X/z — exactly what the reference feeds its extractor
(`r_pts_norm[i] = v2_new(-r_norm[0], -r_norm[1])`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bundler_sfm_tpu.ops.triangulate import triangulate_track, triangulate_two_view

_D = jnp.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])

# M = diag(-1,-1,1): conjugation that converts a ray-coordinate E to the
# pixel-normalized-coordinate frame (the entry negation pattern at
# `lib/5point/5point.c` "E2[0] = -E2[0]; ..." is exactly M E M).
_M = jnp.diag(jnp.array([-1.0, -1.0, 1.0]))


def _candidates(E: jnp.ndarray):
    from bundler_sfm_tpu.ops.svd_utils import svd_small
    U, S, Vt = svd_small(E)
    # E is rank 2: svd_small's third left-singular column (s3=0) is
    # numerically undefined — rebuild it as u0 x u1 (U is orthonormal).
    u2 = jnp.cross(U[:, 0], U[:, 1])
    u2 = u2 / jnp.maximum(jnp.linalg.norm(u2), 1e-30)
    U = U.at[:, 2].set(u2)
    tu = U[:, 2]
    Ra = U @ _D @ Vt
    Rb = U @ _D.T @ Vt
    Ra = Ra * jnp.sign(jnp.linalg.det(Ra))
    Rb = Rb * jnp.sign(jnp.linalg.det(Rb))
    Rs = jnp.stack([Ra, Ra, Rb, Rb])
    ts = jnp.stack([tu, -tu, tu, -tu])
    return Rs, ts


def decompose_essential(E: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray):
    """(R, t, ok) from E and ONE correspondence in ray coords [2]."""
    Rs, ts = _candidates(E)
    I = jnp.eye(3, dtype=E.dtype)
    t0 = jnp.zeros(3, dtype=E.dtype)

    def depths(R, t):
        X, _ = triangulate_two_view(p1, p2, I, t0, R, t)
        return X[2], (R @ X + t)[2]

    c1, c2 = jax.vmap(depths)(Rs, ts)
    good = (c1 < 0) & (c2 < 0)
    idx = jnp.argmax(good)
    return Rs[idx], ts[idx], jnp.any(good)


def decompose_essential_multipt(E: jnp.ndarray, p1: jnp.ndarray,
                                p2: jnp.ndarray, mask: jnp.ndarray):
    """Multi-point candidate selection (find_extrinsics_essential_multipt):
    pick the (R, t) candidate with the most both-depths-negative votes.

    p1/p2: [N,2] ray coords (padded), mask: [N] valid."""
    Rs, ts = _candidates(E)
    I = jnp.eye(3, dtype=E.dtype)
    t0 = jnp.zeros(3, dtype=E.dtype)

    def votes(R, t):
        def one(a, b, m):
            pv = jnp.stack([a, b])
            RR = jnp.stack([I, R])
            tt = jnp.stack([t0, t])
            X, _ = triangulate_track(pv, RR, tt, jnp.ones(2, dtype=bool), 3)
            return ((X[2] < 0) & ((R @ X + t)[2] < 0) & m).astype(jnp.int32)
        return jnp.sum(jax.vmap(one)(p1, p2, mask))

    counts = jax.vmap(votes)(Rs, ts)
    idx = jnp.argmax(counts)
    ok = counts[idx] > 0
    return Rs[idx], ts[idx], ok


def pose_to_center(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """w2c translation t -> camera center c = -Rᵀ t
    (`src/RelativePose.cpp:187-188`)."""
    return -R.T @ t


def ematrix_to_fmatrix(E_ray: jnp.ndarray, f1, f2) -> jnp.ndarray:
    """Ray-coordinate E -> pixel-coordinate F: F = K2⁻ᵀ (M E M) K1⁻¹
    (`lib/5point/5point.c` E2-negation + K products)."""
    K1inv = jnp.diag(jnp.array([1.0 / f1, 1.0 / f1, 1.0]))
    K2inv = jnp.diag(jnp.array([1.0 / f2, 1.0 / f2, 1.0]))
    return K2inv @ (_M @ E_ray @ _M) @ K1inv
