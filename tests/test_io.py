import numpy as np
import pytest

from bundler_sfm_tpu.io import (
    BundleCamera, BundleFile, BundlePoint,
    read_bundle_file, write_bundle_file,
    read_key_file, write_key_file, keys_to_centered, centered_to_image,
    read_match_file, write_match_file,
    ImageEntry, read_list_file, write_list_file,
)

KERMIT_BUNDLE = "/root/reference/examples/kermit/results.example/bundle.out"
KERMIT_MATCHES = "/root/reference/examples/kermit/results.example/matches.init.txt"


def test_read_kermit_golden_bundle():
    b = read_bundle_file(KERMIT_BUNDLE)
    assert len(b.cameras) == 11
    assert len(b.points) == 634
    cam0 = b.cameras[0]
    # Golden values from examples/kermit/results.example/bundle.out:3
    assert cam0.f == pytest.approx(688.3619, abs=1e-3)
    assert cam0.k1 == pytest.approx(-4.3298e-2, abs=1e-5)
    assert cam0.k2 == pytest.approx(6.4596e-2, abs=1e-5)
    # Cameras 4 and 6 failed to register in the golden run (all-zero blocks).
    assert b.num_registered == 9
    # Registered rotations are orthonormal.
    for cam in b.cameras:
        if not cam.registered:
            continue
        assert np.allclose(cam.R @ cam.R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(cam.R) == pytest.approx(1.0, abs=1e-6)
    # Views reference valid images.
    for p in b.points:
        assert len(p.views) >= 2
        assert p.views[:, 0].max() < 11


def test_bundle_roundtrip(tmp_path):
    b = read_bundle_file(KERMIT_BUNDLE)
    out = tmp_path / "bundle.out"
    write_bundle_file(str(out), b)
    b2 = read_bundle_file(str(out))
    assert len(b2.cameras) == len(b.cameras)
    assert len(b2.points) == len(b.points)
    for c1, c2 in zip(b.cameras, b2.cameras):
        assert np.allclose(c1.R, c2.R)
        assert np.allclose(c1.t, c2.t)
        assert c1.f == pytest.approx(c2.f)
    for p1, p2 in zip(b.points, b2.points):
        assert np.allclose(p1.pos, p2.pos)
        assert np.allclose(p1.views, p2.views)


def test_read_kermit_matches():
    m = read_match_file(KERMIT_MATCHES)
    # Golden: 32 pairs, 2657 total matches (SURVEY.md §6).
    assert len(m) == 32
    assert sum(len(v) for v in m.values()) == 2657
    assert (0, 1) in m
    assert len(m[(0, 1)]) == 210


def test_match_roundtrip(tmp_path):
    m = read_match_file(KERMIT_MATCHES)
    out = tmp_path / "matches.txt"
    write_match_file(str(out), m)
    m2 = read_match_file(str(out))
    assert m.keys() == m2.keys()
    for k in m:
        assert np.array_equal(m[k], m2[k])


def test_key_file_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    n = 37
    info = np.zeros((n, 4), dtype=np.float32)
    info[:, 0] = rng.uniform(0, 640, n).round(2)   # x (col)
    info[:, 1] = rng.uniform(0, 480, n).round(2)   # y (row)
    info[:, 2] = rng.uniform(1, 8, n).round(3)
    info[:, 3] = rng.uniform(-3, 3, n).round(3)
    desc = rng.integers(0, 256, (n, 128)).astype(np.uint8)
    for name in ["a.key", "b.key.gz"]:
        path = tmp_path / name
        write_key_file(str(path), info, desc)
        info2, desc2 = read_key_file(str(path))
        assert np.allclose(info, info2, atol=1e-2)
        assert np.array_equal(desc, desc2)


def test_centered_coords_roundtrip():
    rng = np.random.default_rng(2)
    info = np.zeros((10, 4), dtype=np.float32)
    info[:, 0] = rng.uniform(0, 640, 10)
    info[:, 1] = rng.uniform(0, 480, 10)
    cent = keys_to_centered(info, 640, 480)
    # Reference transform: x - 0.5(W-1), (H-y-1) - 0.5(H-1)
    assert np.allclose(cent[:, 0], info[:, 0] - 319.5, atol=1e-4)
    assert np.allclose(cent[:, 1], (480 - info[:, 1] - 1) - 239.5, atol=1e-4)
    back = centered_to_image(cent[:, :2], 640, 480)
    assert np.allclose(back, info[:, :2], atol=1e-4)


def test_list_file_roundtrip(tmp_path):
    entries = [
        ImageEntry("img0.jpg"),
        ImageEntry("img1.jpg", fisheye=True),
        ImageEntry("img2.jpg", init_focal=700.5),
    ]
    path = tmp_path / "list.txt"
    write_list_file(str(path), entries)
    back = read_list_file(str(path))
    assert [e.name for e in back] == [e.name for e in entries]
    assert back[1].fisheye and not back[0].fisheye
    assert back[2].init_focal == pytest.approx(700.5)
    assert back[2].has_init_focal and not back[0].has_init_focal


def test_ply_writer(tmp_path):
    from bundler_sfm_tpu.io import write_points_ply
    pts = np.array([[0, 0, 1.0], [1, 2, 3.0], [4, 5, 6.0]])
    cols = np.array([[10, 20, 30], [0, 0, 255], [1, 2, 3]])  # middle = outlier
    R = np.eye(3)[None].repeat(2, axis=0)
    centers = np.zeros((2, 3))
    path = tmp_path / "points.ply"
    write_points_ply(str(path), pts, cols, R, centers)
    text = path.read_text()
    assert "element vertex 6" in text  # 2 good points + 2*2 camera vertices
    assert "end_header" in text


def test_read_old_bundle_versions(tmp_path):
    """v0.1/v0.2 bundles (src/BundleIO.cpp:446-448,473-477,567-571) parse
    and are reflected into the v0.3 frame (FixReflectionBug,
    src/BaseGeometry.cpp:484-500)."""
    from bundler_sfm_tpu.io.bundlefile import (
        fix_reflection_bug, read_bundle_file,
    )
    golden = read_bundle_file(
        "/root/reference/examples/kermit/results.example/bundle.out")
    pre = fix_reflection_bug(golden)   # involution: reflect back to pre-v0.3

    # Write a v0.2 file: header, f k1 k2, R, t, views without coords.
    p2 = tmp_path / "bundle_v02.out"
    with open(p2, "w") as f:
        f.write("# Bundle file v0.2\n")
        f.write(f"{len(pre.cameras)} {len(pre.points)}\n")
        for c in pre.cameras:
            if not c.registered:
                f.write("0 0 0\n0 0 0\n0 0 0\n0 0 0\n0 0 0\n")
                continue
            f.write(f"{c.f:.10e} {c.k1:.10e} {c.k2:.10e}\n")
            for r in range(3):
                f.write(" ".join(f"{v:.10e}" for v in c.R[r]) + "\n")
            f.write(" ".join(f"{v:.10e}" for v in c.t) + "\n")
        for p in pre.points:
            f.write(" ".join(f"{v:.10e}" for v in p.pos) + "\n")
            f.write(" ".join(str(int(v)) for v in p.color) + "\n")
            f.write(str(len(p.views)) + " " + " ".join(
                f"{int(v[0])} {int(v[1])}" for v in p.views) + "\n")
    b2 = read_bundle_file(str(p2))
    for cg, cr in zip(golden.cameras, b2.cameras):
        assert np.allclose(cg.R, cr.R)
        assert np.allclose(cg.t, cr.t)
        assert cg.f == pytest.approx(cr.f)
    for pg, pr in zip(golden.points, b2.points):
        assert np.allclose(pg.pos, pr.pos)
        assert np.array_equal(pg.views[:, :2], pr.views[:, :2])

    # v0.1: headerless, focal only.
    p1 = tmp_path / "bundle_v01.out"
    with open(p1, "w") as f:
        f.write(f"{len(pre.cameras)} 1\n")
        for c in pre.cameras:
            if not c.registered:
                f.write("0\n0 0 0\n0 0 0\n0 0 0\n0 0 0\n")
                continue
            f.write(f"{c.f:.10e}\n")
            for r in range(3):
                f.write(" ".join(f"{v:.10e}" for v in c.R[r]) + "\n")
            f.write(" ".join(f"{v:.10e}" for v in c.t) + "\n")
        p = pre.points[0]
        f.write(" ".join(f"{v:.10e}" for v in p.pos) + "\n")
        f.write("1 2 3\n")
        f.write("2 0 5 1 9\n")
    b1 = read_bundle_file(str(p1))
    assert b1.cameras[0].k1 == 0.0
    assert np.allclose(b1.cameras[0].R, golden.cameras[0].R)
    assert np.allclose(b1.points[0].pos, golden.points[0].pos)
    assert b1.points[0].views.shape == (2, 4)


def test_create_match_script(capsys):
    from bundler_sfm_tpu.creatematchscript import create_match_script
    import io as _io
    out = _io.StringIO()
    create_match_script(["img1.jpg 0 700.0", "img2.jpg", "img3.jpg"],
                        key_dir="keys", match_dir="m",
                        keymatch_cmd="KeyMatch", out=out)
    lines = out.getvalue().splitlines()
    assert len(lines) == 3
    assert lines[0] == "KeyMatch keys/img1.key keys/img2.key m/match-000-001.txt"
    assert lines[2] == "KeyMatch keys/img2.key keys/img3.key m/match-001-002.txt"


def test_match_table_roundtrip(tmp_path, rng):
    from bundler_sfm_tpu.io.matchfile import (
        read_match_table, write_match_table,
    )
    matches = {
        (0, 1): rng.integers(0, 500, (37, 2)).astype(np.int32),
        (0, 3): rng.integers(0, 500, (5, 2)).astype(np.int32),
        (2, 3): rng.integers(0, 500, (120, 2)).astype(np.int32),
    }
    write_match_table(4, matches, ".ransac", str(tmp_path))
    assert (tmp_path / "nmatches.ransac.txt").exists()
    assert (tmp_path / "matches.ransac.txt").exists()
    back = read_match_table(4, ".ransac", str(tmp_path))
    assert set(back) == set(matches)
    for p in matches:
        assert np.array_equal(back[p], matches[p])


def test_binary_key_roundtrip(tmp_path):
    """ReadKeysFastBin-layout key files (src/keys.cpp, src/keys.h:134-138):
    roundtrip + the .bin/.bin.gz fallback chain of ReadKeyFileWithDesc."""
    from bundler_sfm_tpu.io.keyfile import (
        read_key_file, write_key_file_bin,
    )
    rng = np.random.default_rng(3)
    info = rng.uniform(0, 500, (37, 4)).astype(np.float32)
    desc = rng.integers(0, 256, (37, 128), dtype=np.uint8)
    p = str(tmp_path / "img.key.bin")
    write_key_file_bin(p, info, desc)
    i2, d2 = read_key_file(p)
    np.testing.assert_array_equal(i2, info)
    np.testing.assert_array_equal(d2, desc)
    # Fallback: asking for img.key finds img.key.bin.
    i3, d3 = read_key_file(str(tmp_path / "img.key"))
    np.testing.assert_array_equal(d3, desc)
    # Gzipped binary.
    pz = str(tmp_path / "z.key.bin.gz")
    write_key_file_bin(pz, info, desc)
    i4, d4 = read_key_file(str(tmp_path / "z.key"))
    np.testing.assert_array_equal(i4, info)
    np.testing.assert_array_equal(d4, desc)
