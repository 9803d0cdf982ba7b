import numpy as np
import pytest
import jax.numpy as jnp

from bundler_sfm_tpu.ops.fisheye import (
    FisheyeParams, distort_points, read_fisheye_file, undistort_points,
    undistort_image,
)


@pytest.fixture
def params():
    return FisheyeParams(fCx=320.0, fCy=240.0, fRad=300.0, fAngle=180.0,
                         fFocal=280.0)


def test_distort_undistort_roundtrip(params, rng):
    # Fisheye pixel points within the image circle.
    ang = rng.uniform(0, 2 * np.pi, 50)
    r = rng.uniform(5, 250, 50)
    pts = np.stack([params.fCx + r * np.cos(ang),
                    params.fCy + r * np.sin(ang)], axis=1)
    rect = np.asarray(undistort_points(jnp.asarray(pts), params))
    back = np.asarray(distort_points(jnp.asarray(rect), params))
    assert np.allclose(back, pts, atol=1e-6)


def test_center_is_fixed_point(params):
    rect = np.asarray(undistort_points(
        jnp.asarray([[params.fCx, params.fCy]]), params))
    assert np.allclose(rect, 0.0, atol=1e-9)


def test_read_fisheye_file(tmp_path):
    f = tmp_path / "fisheye.txt"
    f.write_text("FisheyeCenter: 321.5 239.5\nFisheyeRadius: 289.0\n"
                 "FisheyeAngle: 171.0\nFisheyeFocal: 260.0\n")
    p = read_fisheye_file(str(f))
    assert p.fCx == 321.5 and p.fCy == 239.5
    assert p.fRad == 289.0 and p.fAngle == 171.0 and p.fFocal == 260.0


def test_undistort_image_center(params):
    img = np.zeros((480, 640, 3), dtype=np.uint8)
    img[238:243, 318:323] = 200
    out = undistort_image(img, params)
    # Image center maps to itself.
    assert out[240, 320, 0] > 150
