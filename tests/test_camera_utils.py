"""Finalized-camera utilities (models/camera.py ↔ src/Camera.cpp)."""

import numpy as np
import pytest

from bundler_sfm_tpu.models import camera as cam
from bundler_sfm_tpu.ops.rotations import rodrigues


def look_at_R(center, target, up=(0.0, 1.0, 0.0)):
    """World→camera rotation for a camera at `center` looking at `target`
    in this framework's −z-forward convention (view dir = −R[2])."""
    fwd = np.asarray(target, float) - np.asarray(center, float)
    fwd = fwd / np.linalg.norm(fwd)
    z = -fwd                       # camera z points backwards
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z])


def make_cam(center, target=(0.0, 0.0, 0.0)):
    R = look_at_R(center, target)
    t = -R @ np.asarray(center, float)
    return R, t


def test_fov_roundtrip():
    f = cam.focal_from_fov(60.0, 1024.0)
    assert np.degrees(cam.fov(f, 1024.0)) == pytest.approx(60.0)
    # fov_max: wide image → horizontal fov; the reference's tall-image
    # branch (src/Camera.cpp:133-137) algebraically reduces to the same
    # horizontal fov — keep that behavior.
    assert cam.fov_max(f, 1024.0, 768.0) == pytest.approx(cam.fov(f, 1024.0))
    assert cam.fov_max(f, 768.0, 1024.0) == pytest.approx(cam.fov(f, 768.0))


def test_project_in_front_and_distortion_guard():
    R, t = make_cam([0.0, 0.0, 5.0])
    f = 700.0
    u, ok = cam.project(R, t, f, -0.05, 0.01, np.array([0.2, 0.1, 0.0]))
    assert ok
    # Matches the model: p = RX + t, u = -f p/p.z scaled by distortion.
    p = R @ np.array([0.2, 0.1, 0.0]) + t
    u0 = -f * p[:2] / p[2]
    rsq = (u0 @ u0) / f**2
    np.testing.assert_allclose(u, u0 * (1 - 0.05 * rsq + 0.01 * rsq**2),
                               rtol=1e-12)
    # Behind the camera
    _, ok_behind = cam.project(R, t, f, 0.0, 0.0, np.array([0.0, 0.0, 99.0]))
    assert not ok_behind
    # Bad-extrapolation guard (src/Camera.cpp:166-167): huge r² leaves the
    # undistorted projection untouched.
    far = np.array([40.0, 0.0, 4.0])   # ~1 unit in front, way off-axis
    u_g, _ = cam.project(R, t, f, -0.5, 0.0, far)
    u_n, _ = cam.project(R, t, f, 0.0, 0.0, far)
    np.testing.assert_allclose(u_g, u_n)


def test_point_in_front_and_inside_image():
    R, t = make_cam([0.0, 0.0, 5.0])
    assert cam.point_in_front(R, t, np.zeros(3))
    assert not cam.point_in_front(R, t, np.array([0.0, 0.0, 9.0]))
    assert cam.point_inside_image(R, t, 700.0, 0.0, 0.0, np.zeros(3),
                                  640, 480)
    # Project far outside the 640-wide image.
    assert not cam.point_inside_image(R, t, 700.0, 0.0, 0.0,
                                      np.array([4.0, 0.0, 0.0]), 640, 480)


def test_essential_fundamental_epipolar_constraint(rng):
    """h2ᵀ·F·h1 = 0 for homogeneous image points h = (x, y, 1) in the
    framework's −z-division convention (src/Camera.cpp:175-225)."""
    f1, f2 = 650.0, 800.0
    R1, t1 = make_cam([0.0, 0.5, 6.0])
    R2, t2 = make_cam([2.0, -0.3, 5.5])
    F = cam.fundamental_between(R1, t1, f1, R2, t2, f2)
    E = cam.essential_between(R1, t1, R2, t2)
    X = rng.uniform(-1.5, 1.5, (50, 3))
    u1, ok1 = cam.project(R1, t1, f1, 0.0, 0.0, X)
    u2, ok2 = cam.project(R2, t2, f2, 0.0, 0.0, X)
    assert ok1.all() and ok2.all()
    h1 = np.concatenate([u1, np.ones((50, 1))], axis=1)
    h2 = np.concatenate([u2, np.ones((50, 1))], axis=1)
    resid = np.einsum("ni,ij,nj->n", h2, F, h1)
    assert np.abs(resid).max() < 1e-9 * np.abs(F).max() * f1 * f2
    # E operates on normalized (x/f, y/f, 1) coords.
    n1 = h1 / np.array([f1, f1, 1.0])
    n2 = h2 / np.array([f2, f2, 1.0])
    resid_e = np.einsum("ni,ij,nj->n", n2, E, n1)
    assert np.abs(resid_e).max() < 1e-12 * np.abs(E).max() * 100


def test_reflect_keeps_projection_x_negates_nothing_visible():
    # Reflect flips the camera over z; reflected camera still projects the
    # mirrored world consistently: center z negates.
    R, t = make_cam([1.0, 0.2, 5.0])
    R2, t2 = cam.reflect(R, t)
    c, c2 = cam.camera_center(R, t), cam.camera_center(R2, t2)
    np.testing.assert_allclose(c2, c * np.array([1.0, 1.0, -1.0]),
                               atol=1e-12)
    # Reflect conjugates by diag(1,1,-1): still a proper rotation.
    np.testing.assert_allclose(R2 @ R2.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(R2) == pytest.approx(1.0)


def test_distance_view_dir_halfspace():
    R1, t1 = make_cam([0.0, 0.0, 5.0])
    R2, t2 = make_cam([3.0, 4.0, 5.0])
    assert cam.camera_distance(R1, t1, R2, t2) == pytest.approx(5.0)
    v = cam.view_direction(R1)
    np.testing.assert_allclose(v, [0.0, 0.0, -1.0], atol=1e-12)
    plane = cam.front_halfspace(R1, t1)
    # Origin is in front: n·x + d > 0
    assert plane[:3] @ np.zeros(3) + plane[3] > 0
    assert plane[:3] @ np.array([0, 0, 9.0]) + plane[3] < 0


def test_twist_angle():
    # No twist for an axis-aligned camera.
    # The reference clamps cosine to 1-1e-8 (src/Camera.cpp:822), so exact
    # zero twist reads as acos(1-1e-8) ≈ 1.4e-4 rad.
    R, _ = make_cam([0.0, 0.0, 5.0])
    assert abs(cam.twist_angle(R)) < 2e-4
    # Rolling the camera-frame by +θ about the optical axis reads as −θ
    # (reference signs by pose P[1,0] = −sin θ, src/Camera.cpp:826-829).
    theta = 0.3
    roll = rodrigues(np.array([0.0, 0.0, theta]))
    Rr = np.asarray(roll) @ R
    assert cam.twist_angle(Rr) == pytest.approx(-theta, abs=1e-6)


def test_pixel_rays():
    R, t = make_cam([0.0, 0.0, 5.0])
    f = 700.0
    ray = cam.pixel_to_camera_ray(0.0, 0.0, f)
    np.testing.assert_allclose(ray, [0.0, 0.0, -1.0], atol=1e-12)
    # Absolute ray through the projection of a world point hits the point.
    X = np.array([0.4, -0.2, 1.0])
    u, _ = cam.project(R, t, f, 0.0, 0.0, X)
    r = cam.pixel_to_camera_ray_absolute(u[0], u[1], f, R)
    c = cam.camera_center(R, t)
    d = X - c
    np.testing.assert_allclose(r, d / np.linalg.norm(d), atol=1e-12)


def test_horizon_line():
    # Camera at height 2 looking horizontally along -z; ground plane y=0.
    R = look_at_R([0.0, 2.0, 5.0], [0.0, 2.0, 0.0])
    f = 700.0
    horizon = cam.horizon_line(R, f, np.array([0.0, 1.0, 0.0]),
                               np.array([0.0, 1.0, 0.0]))
    # For a level camera the horizon is the line y = 0 in centered coords:
    # points with y > 0 are above, y < 0 below.
    assert cam.point_above_horizon(horizon, np.array([0.0, 50.0]))
    assert not cam.point_above_horizon(horizon, np.array([0.0, -50.0]))
    assert abs(horizon[0]) < 1e-9 and abs(horizon[2]) < 1e-9
    # A point ON the ground far ahead projects just below the horizon.
    t = -R @ np.array([0.0, 2.0, 5.0])
    u, ok = cam.project(R, t, f, 0.0, 0.0, np.array([0.0, 0.0, -500.0]))
    assert ok and not cam.point_above_horizon(horizon, u)
    # ... and the sky above it is above.
    u2, _ = cam.project(R, t, f, 0.0, 0.0, np.array([0.0, 100.0, -500.0]))
    assert cam.point_above_horizon(horizon, u2)


def test_vanishing_line_tilted_camera():
    # Tilted camera: horizon through images of two ground-plane directions.
    R0 = look_at_R([0.0, 2.0, 5.0], [0.0, 0.0, 0.0])  # looking down a bit
    f = 500.0
    line = cam.vanishing_line(R0, f, np.array([0.0, 1.0, 0.0]))
    # Images of two in-plane directions must lie on the line.
    for v in (np.array([1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0]),
              np.array([1.0, 0.0, -2.0])):
        p = R0 @ v
        # Homogeneous vanishing point in the −z-division convention
        # (covers directions parallel to the image plane, p.z = 0).
        h = np.array([f * p[0], f * p[1], -p[2]])
        assert abs(line @ h) < 1e-6 * f * np.linalg.norm(h)


def test_interpolate_cameras():
    R1, t1 = make_cam([0.0, 0.0, 5.0])
    R2, t2 = make_cam([5.0, 0.0, 0.0])
    # Endpoints reproduce the inputs.
    Ra, ta = cam.interpolate_cameras(R1, t1, R2, t2, 0.0)
    np.testing.assert_allclose(Ra, R1, atol=1e-9)
    np.testing.assert_allclose(ta, t1, atol=1e-9)
    Rb, tb = cam.interpolate_cameras(R1, t1, R2, t2, 1.0)
    np.testing.assert_allclose(Rb, R2, atol=1e-9)
    # Midpoint: center is the midpoint, R is a proper rotation.
    Rm, tm = cam.interpolate_cameras(R1, t1, R2, t2, 0.5)
    np.testing.assert_allclose(cam.camera_center(Rm, tm), [2.5, 0.0, 2.5],
                               atol=1e-9)
    np.testing.assert_allclose(Rm @ Rm.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(Rm) == pytest.approx(1.0)


def test_up_camera():
    # Rolled camera: up_camera removes the roll (up has no image-x comp).
    R, t = make_cam([0.0, 1.0, 5.0])
    roll = rodrigues(np.array([0.0, 0.0, 0.4]))
    Rr = np.asarray(roll) @ R
    tr = -Rr @ cam.camera_center(R, t)
    R2, t2 = cam.up_camera(Rr, tr, np.array([0.0, 1.0, 0.0]))
    up_img = R2 @ np.array([0.0, 1.0, 0.0])
    assert abs(up_img[0]) < 1e-9 and up_img[1] > 0
    # Position unchanged.
    np.testing.assert_allclose(cam.camera_center(R2, t2),
                               cam.camera_center(R, t), atol=1e-9)
