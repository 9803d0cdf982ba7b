import numpy as np
import pytest

from bundler_sfm_tpu.features.sift import extract_sift


def make_blob_image(rng, size=200, n_blobs=12):
    """Image of Gaussian blobs — each should yield at least one SIFT key."""
    img = np.full((size, size), 40.0)
    ys, xs = np.mgrid[0:size, 0:size]
    centers = []
    for _ in range(n_blobs):
        cx = rng.uniform(40, size - 40)
        cy = rng.uniform(40, size - 40)
        s = rng.uniform(3, 6)
        img += 180.0 * np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * s * s))
        centers.append((cx, cy))
    return np.clip(img, 0, 255), np.array(centers)


@pytest.mark.slow
def test_sift_detects_blobs(rng):
    img, centers = make_blob_image(rng)
    info, desc = extract_sift(img, max_keys_total=512)
    assert len(info) >= len(centers) // 2
    assert desc.shape[1] == 128
    assert desc.dtype == np.uint8
    # Most blob centers have a detected key within 3 px.
    hits = 0
    for cx, cy in centers:
        d = np.hypot(info[:, 0] - cx, info[:, 1] - cy)
        if d.min() < 3.0:
            hits += 1
    assert hits >= len(centers) * 0.6


@pytest.mark.slow
def test_sift_descriptor_shift_invariance(rng):
    """The same blob pattern shifted by 8px produces matchable descriptors."""
    img, _ = make_blob_image(rng, n_blobs=10)
    img2 = np.roll(img, (8, 13), axis=(0, 1))
    i1, d1 = extract_sift(img, max_keys_total=256)
    i2, d2 = extract_sift(img2, max_keys_total=256)
    from bundler_sfm_tpu.ops.matching import match_pair
    m = match_pair(d1, d2)
    assert len(m) >= 5
    # Matched keys differ by the shift.
    dx = i2[m[:, 1], 0] - i1[m[:, 0], 0]
    dy = i2[m[:, 1], 1] - i1[m[:, 0], 1]
    good = (np.abs(dx - 13) < 2) & (np.abs(dy - 8) < 2)
    assert good.mean() > 0.7


def test_sift_batch_matches_single(rng):
    """extract_sift_batch == per-image extract_sift (up to f32 conv
    rounding), across mixed shapes."""
    from bundler_sfm_tpu.features.sift import extract_sift_batch
    imgs = [make_blob_image(rng)[0] for _ in range(2)]
    imgs.append(make_blob_image(rng)[0].T.copy())   # different shape group
    batch = extract_sift_batch(imgs, max_keys_total=256)
    for im, (bi, bd) in zip(imgs, batch):
        info, desc = extract_sift(im, max_keys_total=256)
        assert len(info) == len(bi)
        assert np.allclose(info, bi, atol=1e-3)
        # Descriptors are uint8; rounding can flip an occasional cell.
        assert (desc.astype(int) - bd.astype(int) == 0).mean() > 0.999
