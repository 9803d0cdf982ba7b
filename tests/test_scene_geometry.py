"""Plane fitting (ops/plane.py) and scene-geometry post-ops
(export/scene_geometry.py) against synthetic ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bundler_sfm_tpu.io.bundlefile import (
    BundleCamera, BundleFile, BundlePoint,
)
from bundler_sfm_tpu.ops.plane import (
    fit_line_2d_ransac, fit_plane_ortho, fit_plane_ransac,
    plane_point_distance,
)
from bundler_sfm_tpu.export.scene_geometry import (
    estimate_axes, estimate_point_normals_confidence, fit_plane_to_points,
    images_part_of_panorama, remove_bad_images, setup_scene_ground_plane,
)
from tests.synthetic import look_at_rotation


def plane_points(rng, n, normal, d, noise=0.0):
    normal = np.asarray(normal, float)
    normal /= np.linalg.norm(normal)
    # Basis in the plane.
    a = np.cross(normal, [1.0, 0.0, 0.0])
    if np.linalg.norm(a) < 1e-6:
        a = np.cross(normal, [0.0, 1.0, 0.0])
    a /= np.linalg.norm(a)
    b = np.cross(normal, a)
    uv = rng.uniform(-5, 5, (n, 2))
    pts = -d * normal + uv[:, :1] * a + uv[:, 1:] * b
    pts += rng.normal(size=(n, 3)) * noise
    return pts


def test_fit_plane_ortho_exact(rng):
    normal = np.array([1.0, 2.0, -0.5])
    pts = plane_points(rng, 50, normal, d=-3.0)
    plane = np.asarray(fit_plane_ortho(jnp.asarray(pts)))
    n = plane[:3] / np.linalg.norm(plane[:3])
    gt = normal / np.linalg.norm(normal)
    assert min(np.linalg.norm(n - gt), np.linalg.norm(n + gt)) < 1e-8
    assert np.abs(pts @ plane[:3] + plane[3]).max() < 1e-8
    assert plane[3] <= 0.0  # sign convention fit.c:333-338


def test_fit_plane_ransac_with_outliers(rng):
    pts = plane_points(rng, 200, [0.0, 1.0, 0.2], d=-1.0, noise=0.01)
    junk = rng.uniform(-5, 5, (60, 3))
    allpts = np.concatenate([pts, junk])
    mask = np.ones(len(allpts))
    plane, n_inl, inl = fit_plane_ransac(
        jax.random.PRNGKey(0), jnp.asarray(allpts), jnp.asarray(mask),
        0.05, rounds=512)
    plane = np.asarray(plane)
    assert int(n_inl) > 180
    d = np.abs(pts @ plane[:3] + plane[3])
    assert np.median(d) < 0.02
    # Mask respected: masked-out points can't be inliers.
    mask2 = mask.copy()
    mask2[:100] = 0.0
    _, _, inl2 = fit_plane_ransac(
        jax.random.PRNGKey(0), jnp.asarray(allpts), jnp.asarray(mask2),
        0.05, rounds=512)
    assert not np.asarray(inl2)[:100].any()


def test_fit_line_2d_ransac(rng):
    t = rng.uniform(-4, 4, 150)
    pts = np.stack([t, 0.5 * t + 2.0], axis=1)
    pts += rng.normal(size=pts.shape) * 0.01
    junk = rng.uniform(-4, 4, (40, 2))
    allp = np.concatenate([pts, junk])
    line, n_inl, _ = fit_line_2d_ransac(
        jax.random.PRNGKey(1), jnp.asarray(allp),
        jnp.ones(len(allp)), 0.05, rounds=256)
    line = np.asarray(line)
    assert int(n_inl) > 130
    assert np.median(np.abs(pts @ line[:2] + line[2])) < 0.03


def make_bundle(rng, n_cams=8, n_pts=60, up=(0.0, 1.0, 0.0), radius=4.0):
    """Cameras on a ring in the plane perpendicular to `up`, looking at the
    origin; points near the origin."""
    up = np.asarray(up, float)
    up /= np.linalg.norm(up)
    a = np.cross(up, [1.0, 0.0, 0.0])
    if np.linalg.norm(a) < 1e-6:
        a = np.cross(up, [0.0, 0.0, 1.0])
    a /= np.linalg.norm(a)
    b = np.cross(up, a)
    cams = []
    centers = []
    for i in range(n_cams):
        th = 2 * np.pi * i / n_cams
        c = radius * (np.cos(th) * a + np.sin(th) * b)
        c += up * rng.normal() * 0.02   # slight off-plane jitter
        R = look_at_rotation(c, np.zeros(3), up=up)
        cams.append(BundleCamera(f=700.0, k1=0.0, k2=0.0, R=R, t=-R @ c))
        centers.append(c)
    pts = []
    pts_pos = rng.normal(size=(n_pts, 3)) * 0.5
    for p in pts_pos:
        views = np.array([[i, 0, 0.0, 0.0] for i in range(n_cams)])
        pts.append(BundlePoint(pos=p, color=np.array([128, 128, 128.0]),
                               views=views))
    return BundleFile(cameras=cams, points=pts), np.stack(centers)


def test_setup_scene_ground_plane(rng):
    up_gt = np.array([0.1, 1.0, -0.05])
    up_gt /= np.linalg.norm(up_gt)
    bundle, centers = make_bundle(rng, up=up_gt)
    center, up, x_axis, z_axis, scale = setup_scene_ground_plane(bundle)
    assert np.allclose(center, centers.mean(axis=0))
    # Plane normal is the up direction (sign-voted toward camera ups).
    assert abs(up @ up_gt) > 0.999
    assert up @ up_gt > 0  # cameras' up rows vote the sign
    # Axes form a right-handed orthonormal frame.
    assert abs(x_axis @ up) < 1e-8
    assert np.allclose(np.cross(x_axis, up), z_axis)
    assert scale == pytest.approx(np.sqrt(
        ((centers - centers.mean(0)) ** 2).sum(1).mean()), rel=1e-6)


def test_estimate_axes(rng):
    up_gt = np.array([0.0, 1.0, 0.0])
    bundle, _ = make_bundle(rng, up=up_gt)
    x_axis, y_axis, z_axis = estimate_axes(bundle)
    assert abs(y_axis @ up_gt) > 0.99
    assert abs(x_axis @ y_axis) < 1e-8
    assert np.allclose(np.cross(x_axis, y_axis), z_axis, atol=1e-8)


def test_fit_plane_to_points_modes(rng):
    pts = plane_points(rng, 120, [0.0, 1.0, 0.0], d=-2.0, noise=0.005)
    plane, inl = fit_plane_to_points(pts, ransac_threshold=0.05)
    assert len(inl) > 100
    n = plane[:3] / np.linalg.norm(plane[:3])
    assert abs(n[1]) > 0.999
    # perp_to_up: normal snapped to up through the inlier centroid.
    up = np.array([0.0, 1.0, 0.0])
    plane2, inl2 = fit_plane_to_points(pts, ransac_threshold=0.05,
                                       perp_to_up=True, up=up)
    assert np.allclose(plane2[:3], up)
    # par_to_up: vertical plane through a line of points.
    t = rng.uniform(-3, 3, 80)
    wall = np.stack([t, rng.uniform(0, 2, 80), 0.3 * t + 1.0], axis=1)
    plane3, inl3 = fit_plane_to_points(wall, ransac_threshold=0.05,
                                       par_to_up=True, up=up)
    assert plane3[1] == 0.0
    assert len(inl3) > 70


def test_point_normals_confidence(rng):
    bundle, centers = make_bundle(rng, n_cams=8, n_pts=10)
    normals, conf = estimate_point_normals_confidence(bundle)
    # Cameras surround each point on a ring -> mean ray cancels laterally;
    # normal is unit; confidence is high (rays spread >> 20 deg).
    assert np.allclose(np.linalg.norm(normals, axis=1), 1.0)
    assert (conf > 0.9).all()
    # A point seen by <= 2 cameras has zero confidence (:1377-1378).
    bundle.points[0] = BundlePoint(
        pos=bundle.points[0].pos, color=bundle.points[0].color,
        views=bundle.points[0].views[:2])
    _, conf2 = estimate_point_normals_confidence(bundle)
    assert conf2[0] == 0.0


def test_remove_bad_images(rng):
    bundle, _ = make_bundle(rng, n_cams=4, n_pts=30)
    # Starve camera 3: erase it from all but 5 points.
    for i, p in enumerate(bundle.points):
        if i >= 5:
            bundle.points[i] = BundlePoint(
                pos=p.pos, color=p.color,
                views=p.views[p.views[:, 0] != 3])
    out = remove_bad_images(bundle, min_num_points=24)
    assert not out.cameras[3].registered
    assert all(c.registered for c in out.cameras[:3])
    for p in out.points:
        assert 3 not in p.views[:, 0].astype(int)


def test_images_part_of_panorama(rng):
    bundle, _ = make_bundle(rng, n_cams=4, n_pts=30, radius=4.0)
    # Ring cameras are far apart -> not a panorama.
    assert not images_part_of_panorama(bundle, 0, 1)
    # Co-located cameras viewing the same points -> panorama.
    c = np.array([0.0, 0.0, 10.0])
    R1 = look_at_rotation(c, np.zeros(3))
    R2 = look_at_rotation(c + 1e-4, np.zeros(3))
    cams = [BundleCamera(f=700.0, k1=0, k2=0, R=R1, t=-R1 @ c),
            BundleCamera(f=700.0, k1=0, k2=0, R=R2, t=-R2 @ (c + 1e-4))]
    pts = [BundlePoint(pos=rng.normal(size=3) * 0.5,
                       color=np.zeros(3),
                       views=np.array([[0, 0, 0, 0], [1, 0, 0, 0.0]]))
           for _ in range(10)]
    pano = BundleFile(cameras=cams, points=pts)
    assert images_part_of_panorama(pano, 0, 1)


def test_panorama_point_at_infinity(rng):
    """Panorama mode replaces triangulation with point-at-infinity on the
    first view's ray (GeneratePointAtInfinity, src/BundleAdd.cpp:129-176)."""
    from bundler_sfm_tpu.config import default_pipeline_config
    from bundler_sfm_tpu.pipeline.scene import ImageEntry, Scene
    from bundler_sfm_tpu.pipeline.incremental import (
        Reconstruction, add_all_new_points,
    )
    cfg = default_pipeline_config(panorama_mode=True, ray_angle_threshold=0.0)
    f = 700.0
    c = np.array([1.0, 2.0, 3.0])
    R0 = np.eye(3)
    th = np.deg2rad(10)
    R1 = np.array([[np.cos(th), 0, np.sin(th)],
                   [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]])
    # Two co-located cameras; tracks from world directions behind -z.
    dirs = rng.normal(size=(12, 3)) * np.array([0.3, 0.3, 0.0]) + \
        np.array([0.0, 0.0, -1.0])
    key_xy = []
    for R in (R0, R1):
        q = dirs @ R.T          # R @ dir per row
        key_xy.append((-f * q[:, :2] / q[:, 2:3]).astype(np.float64))
    n = len(dirs)
    scene = Scene(
        config=cfg,
        entries=[ImageEntry("a.jpg", init_focal=f),
                 ImageEntry("b.jpg", init_focal=f)],
        dims=[(1024, 768)] * 2, key_xy=key_xy,
        tracks=[[(0, k), (1, k)] for k in range(n)],
        visible_points=[list(range(n)), list(range(n))],
        visible_keys=[list(range(n)), list(range(n))],
        key_track=[{k: k for k in range(n)}] * 2)
    recon = Reconstruction(
        added_order=[0, 1], cam_R=[R0, R1],
        cam_params=[np.array([*c, 0, 0, 0, f, 0, 0.0]),
                    np.array([*c, 0, 0, 0, f, 0, 0.0])],
        points=[], colors=[], pt_views=[],
        track_extra=np.full(n, -1, dtype=np.int64),
        key_extra=[{}, {}])
    added = add_all_new_points(recon, scene)
    assert added == n
    for ti in range(n):
        X = recon.points[ti]
        # Point sits at unit distance from the (shared) camera center,
        # along the first view's ray.
        assert np.linalg.norm(X - c) == pytest.approx(1.0, abs=1e-9)
        d = dirs[ti] / np.linalg.norm(dirs[ti])
        assert np.allclose((X - c), d, atol=1e-9)


def test_knn_plane_normals(rng):
    from bundler_sfm_tpu.ops.plane import knn_plane_normals
    pts = plane_points(rng, 100, [0.2, 1.0, 0.0], d=-1.0, noise=0.002)
    normals = np.asarray(knn_plane_normals(jnp.asarray(pts),
                                           jnp.ones(100), k=16))
    gt = np.array([0.2, 1.0, 0.0])
    gt /= np.linalg.norm(gt)
    dots = np.abs(normals @ gt)
    assert (dots > 0.99).mean() > 0.95


def test_estimate_point_normals_knn(rng):
    from bundler_sfm_tpu.export.scene_geometry import estimate_point_normals
    bundle, centers = make_bundle(rng, n_cams=6, n_pts=40)
    # Flatten points onto a plane so normals are well-defined.
    for i, p in enumerate(bundle.points):
        pos = p.pos.copy()
        pos[1] = 0.0
        bundle.points[i] = BundlePoint(pos=pos, color=p.color, views=p.views)
    normals = estimate_point_normals(bundle, k=12)
    assert np.allclose(np.abs(normals[:, 1]), 1.0, atol=1e-2)


def test_compute_image_rotations(rng):
    from bundler_sfm_tpu.export.scene_geometry import compute_image_rotations
    bundle, _ = make_bundle(rng, up=(0.0, 1.0, 0.0))
    rots = compute_image_rotations(bundle)
    # Upright cameras need no rotation.
    assert all(r == 0 for r in rots)
    # Roll camera 0 by 90 degrees about its optical axis -> quarter turn.
    c0 = bundle.cameras[0]
    Rz = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    bundle.cameras[0] = BundleCamera(f=c0.f, k1=0, k2=0, R=Rz @ c0.R,
                                     t=Rz @ c0.t)
    rots2 = compute_image_rotations(bundle)
    assert rots2[0] in (1, 3) and rots2[1] == 0


def test_get_point_projections(rng):
    from bundler_sfm_tpu.export.scene_geometry import get_point_projections
    bundle, centers = make_bundle(rng, n_cams=4, n_pts=30)
    projs, kept = get_point_projections(bundle, 0, width=10000, height=10000)
    assert len(kept) == 30          # all in front and inside a huge image
    # A tiny image keeps only near-center projections.
    projs2, kept2 = get_point_projections(bundle, 0, width=2, height=2)
    assert len(kept2) < 30
    assert (np.abs(projs2) <= 1.0).all()


def test_xml_writers(rng, tmp_path):
    from bundler_sfm_tpu.io.xmlfile import write_cameras_xml, write_points_xml
    import xml.dom.minidom as minidom
    bundle, _ = make_bundle(rng, n_cams=3, n_pts=8)
    names = [f"img{i}.key" for i in range(3)]
    cam_path = tmp_path / "cameras.xml"
    write_cameras_xml(str(cam_path), bundle, names, [(1024, 768)] * 3,
                      fit_plane=np.array([0.0, 1.0, 0.0, 5.0]))
    txt = cam_path.read_text()
    assert txt.count("<camera>") == 3
    assert "img0.jpg" in txt
    assert "<p1>" in txt
    pts_path = tmp_path / "points.xml"
    write_points_xml(str(pts_path), bundle, min_views=3)
    # All 8 points seen by 8 cameras >= 3 views; well-formed XML body.
    body = pts_path.read_text()
    assert body.count("<point>") == 8
    minidom.parseString(body[body.index("<points>"):])
