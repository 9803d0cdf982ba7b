import numpy as np
import pytest
import jax.numpy as jnp

from bundler_sfm_tpu.ops.fisheye import (
    FisheyeParams, distort_points, read_fisheye_file, undistort_points,
    undistort_image,
)


@pytest.fixture
def params():
    # fCx/fCy are offsets in CENTERED coords (reference convention: keys
    # are centered when UndistortPoint subtracts m_fCx,
    # src/ImageData.cpp:1183) — a slightly decentered fisheye circle.
    return FisheyeParams(fCx=2.5, fCy=-1.5, fRad=300.0, fAngle=180.0,
                         fFocal=280.0)


def test_distort_undistort_roundtrip(params, rng):
    # Fisheye (centered) points within the image circle.
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
    f.write_text("FisheyeCenter: 1.5 -0.5\nFisheyeRadius: 289.0\n"
                 "FisheyeAngle: 171.0\nFisheyeFocal: 260.0\n")
    p = read_fisheye_file(str(f))
    assert p.fCx == 1.5 and p.fCy == -0.5
    assert p.fRad == 289.0 and p.fAngle == 171.0 and p.fFocal == 260.0


def test_undistort_image_center():
    # Centered fisheye circle (fCx = fCy = 0): the image center is a fixed
    # point of the resampling (src/FisheyeUndistort.cpp:131-139 re-adds
    # 0.5*w/h after DistortPoint).
    p = FisheyeParams(fCx=0.0, fCy=0.0, fRad=300.0, fAngle=180.0,
                      fFocal=280.0)
    img = np.zeros((480, 640, 3), dtype=np.uint8)
    img[238:243, 318:323] = 200
    out = undistort_image(img, p)
    assert out[240, 320, 0] > 150


def test_fisheye_bundler_cli_e2e(rng, tmp_path):
    """Fisheye end-to-end through the bundler CLI: synthetic rectilinear
    observations pushed through the fisheye model, written as .key files +
    list.txt fisheye flags + fisheye.txt; `--fisheye` must rectify the
    keys at load (src/ImageData.cpp:1195-1213 UndistortKeys) and the
    reconstruction must register all cameras at the true focal."""
    from tests.synthetic import Scene as SynScene
    from bundler_sfm_tpu.bundler import main as bundler_main
    from bundler_sfm_tpu.io.keyfile import centered_to_image, write_key_file

    f = 700.0
    W, H = 1024, 768
    p = FisheyeParams(fCx=0.0, fCy=0.0, fRad=480.0, fAngle=160.0,
                      fFocal=420.0)
    syn = SynScene(rng, num_cams=4, num_pts=160, f=f, noise=0.2)
    d = tmp_path
    names = []
    keymap = []
    for c in range(4):
        xy = syn.obs[c]
        inside = (np.abs(xy[:, 0]) < W / 2 - 40) & \
            (np.abs(xy[:, 1]) < H / 2 - 40)
        rect = xy[inside]
        fish = np.asarray(distort_points(jnp.asarray(rect), p))
        raw = centered_to_image(fish, W, H)
        info = np.zeros((len(raw), 4))
        info[:, 0:2] = raw
        info[:, 2] = 2.0
        name = f"img{c:02d}.jpg"
        from PIL import Image
        Image.new("L", (W, H), 128).save(str(d / name))
        write_key_file(str(d / f"img{c:02d}.key"), info,
                       np.zeros((len(raw), 128), np.uint8))
        names.append(name)
        keymap.append({int(pt): k for k, pt in
                       enumerate(np.nonzero(inside)[0])})
    with open(d / "list.txt", "w") as fh:
        for n in names:
            fh.write(f"{n} 1 {f:.2f}\n")
    with open(d / "fisheye.txt", "w") as fh:
        fh.write(f"FisheyeCenter: {p.fCx} {p.fCy}\n"
                 f"FisheyeRadius: {p.fRad}\nFisheyeAngle: {p.fAngle}\n"
                 f"FisheyeFocal: {p.fFocal}\n")
    # Matches from shared points (key indices).
    lines = []
    for i in range(4):
        for j in range(i + 1, 4):
            shared = [q for q in keymap[i] if q in keymap[j]]
            lines.append(f"{i} {j}\n{len(shared)}\n" + "".join(
                f"{keymap[i][q]} {keymap[j][q]}\n" for q in shared))
    with open(d / "matches.init.txt", "w") as fh:
        fh.write("".join(lines))

    import os
    cwd = os.getcwd()
    os.chdir(d)
    try:
        rc = bundler_main([
            "list.txt", "--run_bundle", "--fisheye", "fisheye.txt",
            "--match_table", "matches.init.txt", "--output_dir", "out",
            "--output", "bundle.out", "--variable_focal_length",
            "--use_focal_estimate", "--constrain_focal",
            "--constrain_focal_weight", "0.0001",
        ])
    finally:
        os.chdir(cwd)
    assert rc == 0
    from bundler_sfm_tpu.io import read_bundle_file
    b = read_bundle_file(str(d / "out" / "bundle.out"))
    assert b.num_registered == 4
    for c in b.cameras:
        if c.registered:
            assert c.f == pytest.approx(f, rel=0.05)
