import numpy as np
import pytest

from tests.synthetic import look_at_rotation, project

from bundler_sfm_tpu.ops.homography import fit_homography_dlt
from bundler_sfm_tpu.ops.homography_decompose import (
    decompose_homography, fundamental_from_pose, homography_pixel_to_ray,
)
import jax.numpy as jnp


def make_planar_scene(rng, n=80, f=700.0):
    """Points on the z=0 plane seen by two cameras."""
    pts = np.zeros((n, 3))
    pts[:, 0] = rng.uniform(-2, 2, n)
    pts[:, 1] = rng.uniform(-2, 2, n)
    c0 = np.array([0.5, 0.3, 6.0])
    c1 = np.array([-1.2, 0.8, 5.5])
    R0 = look_at_rotation(c0, np.zeros(3))
    R1 = look_at_rotation(c1, np.zeros(3))
    x0 = project(R0, c0, f, 0, 0, pts)
    x1 = project(R1, c1, f, 0, 0, pts)
    return pts, (R0, c0, x0), (R1, c1, x1), f


def test_decompose_homography_planar(rng):
    pts, (R0, c0, x0), (R1, c1, x1), f = make_planar_scene(rng)
    # Fit H from the planar correspondences (exact).
    H = np.asarray(fit_homography_dlt(jnp.asarray(x0), jnp.asarray(x1),
                                      jnp.ones(len(x0), dtype=bool)))
    # Residual sanity.
    ph = np.concatenate([x0, np.ones((len(x0), 1))], 1) @ H.T
    assert np.abs(ph[:, :2] / ph[:, 2:3] - x1).max() < 1e-6

    H_ray = homography_pixel_to_ray(H, f, f)
    sols = decompose_homography(H_ray)
    # Ground truth relative pose (world = cam0 frame).
    R_rel = R1 @ R0.T
    t_rel = -R_rel @ (R0 @ (c1 - c0))
    t_dir = t_rel / np.linalg.norm(t_rel)
    best = np.inf
    for R, t, n in sols:
        errR = np.abs(R - R_rel).max()
        tn = t / max(np.linalg.norm(t), 1e-12)
        errt = min(np.abs(tn - t_dir).max(), np.abs(tn + t_dir).max())
        best = min(best, errR + errt)
    assert best < 1e-6, best


def test_fundamental_from_pose(rng):
    pts, (R0, c0, x0), (R1, c1, x1), f = make_planar_scene(rng, n=40)
    R_rel = R1 @ R0.T
    t_rel = -R_rel @ (R0 @ (c1 - c0))
    F = fundamental_from_pose(R_rel, t_rel, f, f)
    h0 = np.concatenate([x0, np.ones((40, 1))], 1)
    h1 = np.concatenate([x1, np.ones((40, 1))], 1)
    resid = np.abs(np.einsum("ni,ij,nj->n", h1, F, h0))
    scale = np.abs(F).max()
    assert resid.max() / max(scale, 1e-12) < 1e-4
