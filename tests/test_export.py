import os

import numpy as np
import pytest

from bundler_sfm_tpu.export.pmvs import pmvs_projection, write_pmvs
from bundler_sfm_tpu.export.process import (
    compress, prune_bad_points, reposition_scene, rotate_cameras,
    scale_focal_lengths, zero_distortion_params,
)
from bundler_sfm_tpu.export.vis import covisibility_counts, write_vis_file
from bundler_sfm_tpu.export.undistort import undistort_image
from bundler_sfm_tpu.io.bundlefile import read_bundle_file

KERMIT_BUNDLE = "/root/reference/examples/kermit/results.example/bundle.out"
KERMIT_LIST = None  # constructed in-test


@pytest.fixture
def kermit():
    return read_bundle_file(KERMIT_BUNDLE)


def test_pmvs_projection_projects_points(kermit):
    """P from pmvs_projection must project bundle points onto their observed
    pixels (top-left origin, given -f convention)."""
    cam_idx = 0
    cam = kermit.cameras[cam_idx]
    w, h = 640, 480
    P = pmvs_projection(cam.f, cam.R, cam.t, w, h)
    errs = []
    for p in kermit.points[:200]:
        for v in p.views:
            if int(v[0]) != cam_idx:
                continue
            X = np.append(p.pos, 1.0)
            q = P @ X
            uv = q[:2] / q[2]
            # v[2], v[3] are centered coords; convert to top-left.
            x_img = v[2] + 0.5 * (w - 1)
            y_img = (h - 1) - (v[3] + 0.5 * (h - 1))
            errs.append(np.hypot(uv[0] - x_img, uv[1] - y_img))
    assert len(errs) > 10
    # Distortion is not applied by P, so tolerance is a few px.
    assert np.median(errs) < 4.0


def test_write_pmvs(tmp_path, kermit):
    list_file = tmp_path / "list.txt"
    with open(list_file, "w") as f:
        for i in range(11):
            f.write(f"kermit{i:03d}.jpg 0 660.0\n")
    n = write_pmvs(str(tmp_path / "pmvs"), str(list_file), KERMIT_BUNDLE,
                   image_dims=[(640, 480)] * 11)
    assert n == 9  # registered cameras only
    txts = sorted(os.listdir(tmp_path / "pmvs" / "txt"))
    assert len(txts) == 9
    first = (tmp_path / "pmvs" / "txt" / "00000000.txt").read_text()
    assert first.startswith("CONTOUR\n")
    assert (tmp_path / "pmvs" / "pmvs_options.txt").exists()
    assert (tmp_path / "pmvs" / "prep_pmvs.sh").exists()


def test_vis_file(tmp_path, kermit):
    counts = covisibility_counts(kermit)
    assert counts.max() > 32
    assert np.array_equal(counts, counts.T)
    out = tmp_path / "vis.dat"
    write_vis_file(KERMIT_BUNDLE, str(out))
    lines = out.read_text().splitlines()
    assert lines[0] == "VISDATA"
    assert int(lines[1]) == 11
    assert len(lines) == 13


def test_scale_zero_compress(kermit):
    scaled = scale_focal_lengths(kermit, 2.0)
    assert scaled.cameras[0].f == pytest.approx(2 * kermit.cameras[0].f)
    assert not scaled.cameras[4].registered

    z = zero_distortion_params(kermit)
    assert z.cameras[0].k1 == 0.0 and z.cameras[0].k2 == 0.0

    comp, names = compress(kermit, [f"img{i}" for i in range(11)])
    assert len(comp.cameras) == 9
    assert len(names) == 9
    for p in comp.points:
        assert p.views[:, 0].max() < 9


def test_rotate_cameras_preserves_projection(kermit):
    rng = np.random.default_rng(3)
    w = rng.normal(size=3)
    from bundler_sfm_tpu.ops.rotations import rodrigues
    import jax.numpy as jnp
    Rg = np.asarray(rodrigues(jnp.asarray(w)))
    rot = rotate_cameras(kermit, Rg)
    # Projection of a rotated point through a rotated camera is unchanged:
    # R' (X' - c') = R R_gᵀ (R_g X - R_g c) = R (X - c).
    cam0, cam0r = kermit.cameras[0], rot.cameras[0]
    X = kermit.points[0].pos
    Xr = rot.points[0].pos
    p = cam0.R @ X + cam0.t
    pr = cam0r.R @ Xr + cam0r.t
    assert np.allclose(p, pr, atol=1e-9)


def test_prune_bad_points(kermit):
    pruned = prune_bad_points(kermit, min_angle_deg=1.5, min_views=3)
    n_before = sum(1 for p in kermit.points if len(p.views))
    n_after = sum(1 for p in pruned.points if len(p.views))
    assert n_after < n_before       # 2-view points get pruned
    assert len(pruned.points) == len(kermit.points)


def test_reposition_scene(kermit):
    rep = reposition_scene(kermit)
    centers = np.stack([c.center for c in rep.cameras if c.registered])
    assert np.allclose(centers.mean(axis=0), 0.0, atol=1e-9)
    d = np.linalg.norm(centers, axis=1)
    assert np.median(d) == pytest.approx(1.0, abs=1e-9)


def test_undistort_image_identity():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    out = undistort_image(img, f=100.0, k1=0.0, k2=0.0)
    # k=0: interior pixels unchanged.
    assert np.array_equal(out[1:-2, 1:-2], img[1:-2, 1:-2])


def test_undistort_image_radial():
    img = np.zeros((101, 101, 3), dtype=np.uint8)
    img[48:53, 48:53] = 255  # center block
    out = undistort_image(img, f=50.0, k1=-0.2, k2=0.0)
    # Center is a fixed point of radial distortion.
    assert out[50, 50, 0] == 255
