import numpy as np

from bundler_sfm_tpu.ops.matching import (
    match_pair, match_pairs_batched, prune_double_matches, symmetrize, two_nn,
)


def brute_force_matches(d1, d2, ratio=0.6):
    """Reference-semantics matcher in pure numpy (exact 2-NN + ratio test)."""
    a = d1.astype(np.float64)
    b = d2.astype(np.float64)
    D = ((a**2).sum(1)[:, None] + (b**2).sum(1)[None, :] - 2 * a @ b.T)
    out = []
    for i in range(len(a)):
        order = np.argsort(D[i])
        d0, d1_ = D[i, order[0]], D[i, order[1]]
        if d0 < ratio * ratio * d1_:
            out.append((i, order[0]))
    return np.array(out, dtype=np.int32).reshape(-1, 2)


def make_descs(rng, n, seed_descs=None, n_shared=0, noise=4):
    d = rng.integers(0, 256, (n, 128)).astype(np.uint8)
    if seed_descs is not None and n_shared:
        base = seed_descs[:n_shared].astype(np.int32)
        jit = rng.integers(-noise, noise + 1, base.shape)
        d[:n_shared] = np.clip(base + jit, 0, 255).astype(np.uint8)
    return d


def test_two_nn_exact(rng):
    d1 = rng.integers(0, 256, (50, 128)).astype(np.float32)
    d2 = rng.integers(0, 256, (300, 128)).astype(np.float32)
    d2p = np.pad(d2, ((0, 1024 - 300), (0, 0)))
    d0, i0, d1_ = two_nn(d1, d2p, np.int32(300), block=512)
    D = ((d1**2).sum(1)[:, None] + (d2**2).sum(1)[None, :]
         - 2 * d1 @ d2.T)
    order = np.argsort(D, axis=1)
    assert np.array_equal(np.asarray(i0), order[:, 0])
    assert np.allclose(np.asarray(d0), D[np.arange(50), order[:, 0]], atol=1e-2)
    assert np.allclose(np.asarray(d1_), D[np.arange(50), order[:, 1]], atol=1e-2)


def test_match_pair_vs_numpy(rng):
    d2 = make_descs(rng, 200)
    d1 = make_descs(rng, 150, seed_descs=d2, n_shared=60)
    got = match_pair(d1, d2)
    want = brute_force_matches(d1, d2)
    assert np.array_equal(got, want)
    # Shared descriptors should mostly match to their counterparts.
    hits = sum(1 for a, b in got if a == b and a < 60)
    assert hits > 40


def test_match_pairs_batched(rng):
    base = make_descs(rng, 120)
    descs = [make_descs(rng, 100 + 13 * i, seed_descs=base, n_shared=50)
             for i in range(4)]
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3)]
    got = match_pairs_batched(descs, pairs, batch=3, block=256, min_matches=0)
    for (i, j) in pairs:
        want = prune_double_matches(brute_force_matches(descs[i], descs[j]))
        assert np.array_equal(got[(i, j)], want), (i, j)


def test_min_matches_cutoff(rng):
    descs = [make_descs(rng, 64), make_descs(rng, 64)]
    got = match_pairs_batched(descs, [(0, 1)], block=256, min_matches=16)
    # Random descriptors rarely pass the 0.6 ratio test -> pair dropped.
    assert (0, 1) not in got or len(got[(0, 1)]) >= 16


def test_prune_double_matches():
    m = np.array([[0, 5], [1, 7], [2, 5], [3, 9], [4, 7]], dtype=np.int32)
    got = prune_double_matches(m)
    assert np.array_equal(got, np.array([[0, 5], [1, 7], [3, 9]]))


def test_symmetrize():
    m = {(0, 1): np.array([[2, 3], [4, 5]], dtype=np.int32)}
    s = symmetrize(m)
    assert np.array_equal(s[(1, 0)], np.array([[3, 2], [5, 4]]))


def test_int8_path_matches_f32_exactly():
    """Centered-int8 distances (shift invariance) are bit-identical to the
    f32/bf16 path for uint8 descriptors."""
    import jax.numpy as jnp
    from bundler_sfm_tpu.ops.matching import two_nn, _prep_desc
    rng = np.random.default_rng(7)
    q8 = rng.integers(0, 256, (64, 128), dtype=np.uint8)
    d8 = rng.integers(0, 256, (512, 128), dtype=np.uint8)
    qf = q8.astype(np.float32)
    df = d8.astype(np.float32)
    qi = _prep_desc(q8)
    di = _prep_desc(d8)
    assert qi.dtype == np.int8
    d0f, i0f, d1f = two_nn(jnp.asarray(qf), jnp.asarray(df),
                           jnp.int32(500), block=512)
    d0i, i0i, d1i = two_nn(jnp.asarray(qi), jnp.asarray(di),
                           jnp.int32(500), block=512)
    np.testing.assert_array_equal(np.asarray(d0f), np.asarray(d0i))
    np.testing.assert_array_equal(np.asarray(i0f), np.asarray(i0i))
    np.testing.assert_array_equal(np.asarray(d1f), np.asarray(d1i))
    # Multi-block scan path too.
    d0i2, i0i2, _ = two_nn(jnp.asarray(qi), jnp.asarray(di),
                           jnp.int32(500), block=128)
    np.testing.assert_array_equal(np.asarray(d0i2), np.asarray(d0i))
    np.testing.assert_array_equal(np.asarray(i0i2), np.asarray(i0i))


def test_pallas_int8_interpret_matches():
    """The Pallas kernel's int8 branch agrees with the XLA path
    (interpreter mode; the compiled path is exercised on TPU)."""
    import jax.numpy as jnp
    from bundler_sfm_tpu.ops.matching import two_nn, _prep_desc
    from bundler_sfm_tpu.ops.matching_pallas import two_nn_pallas
    rng = np.random.default_rng(11)
    q = _prep_desc(rng.integers(0, 256, (256, 128), dtype=np.uint8))
    d = _prep_desc(rng.integers(0, 256, (512, 128), dtype=np.uint8))
    ref = two_nn(jnp.asarray(q), jnp.asarray(d), jnp.int32(490), block=512)
    got = two_nn_pallas(jnp.asarray(q), jnp.asarray(d), jnp.int32(490),
                        interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pack12_roundtrip(rng):
    """12-bit wire packing is exact for every masked-row value (-1..K-1)."""
    import jax.numpy as jnp
    from bundler_sfm_tpu.ops.matching import _pack12, _unpack12
    K = 2048
    m = rng.integers(-1, K, (5, K)).astype(np.int16)
    m[0, :] = -1
    m[1, :] = K - 1
    p = np.asarray(_pack12(jnp.asarray(m)))
    assert p.shape == (5, K // 2, 3) and p.dtype == np.uint8
    out = _unpack12(p, K)
    np.testing.assert_array_equal(out, m.astype(np.int32))
