import numpy as np
import pytest

from bundler_sfm_tpu import native
from bundler_sfm_tpu.io.keyfile import read_key_file, write_key_file
from bundler_sfm_tpu.ops.matching import symmetrize
from bundler_sfm_tpu.pipeline.tracks import build_tracks


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_key_parse_matches_python(tmp_path, rng):
    n = 500
    info = np.zeros((n, 4), np.float32)
    info[:, 0] = rng.uniform(0, 640, n).round(2)
    info[:, 1] = rng.uniform(0, 480, n).round(2)
    info[:, 2] = rng.uniform(1, 8, n).round(3)
    info[:, 3] = rng.uniform(-3, 3, n).round(3)
    desc = rng.integers(0, 256, (n, 128)).astype(np.uint8)
    path = tmp_path / "t.key"
    write_key_file(str(path), info, desc)
    data = path.read_bytes()
    i2, d2 = native.parse_key_bytes(data)
    assert np.allclose(i2, info, atol=1e-2)
    assert np.array_equal(d2, desc)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_key_parse_malformed():
    with pytest.raises(ValueError):
        native.parse_key_bytes(b"2 128\n1.0 2.0 3.0 garbage")


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_tracks_match_python(rng):
    # Random sparse one-to-one matches across 6 images.
    num_images = 6
    matches = {}
    for i in range(num_images):
        for j in range(i + 1, num_images):
            k = rng.integers(3, 20)
            a = rng.choice(60, k, replace=False).astype(np.int32)
            b = rng.choice(60, k, replace=False).astype(np.int32)
            matches[(i, j)] = np.stack([a, b], axis=1)
    matches = symmetrize(matches)
    t_py = build_tracks(matches, num_images)
    t_nat = native.build_tracks_native(matches, num_images)
    # Same set of tracks (as sets of (img, key)).
    s_py = sorted(tuple(sorted(t)) for t in t_py)
    s_nat = sorted(tuple(sorted(t)) for t in t_nat)
    assert s_py == s_nat
