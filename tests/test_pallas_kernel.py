import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bundler_sfm_tpu.ops.matching import two_nn
from bundler_sfm_tpu.ops.matching_pallas import two_nn_pallas


def test_pallas_two_nn_vmaps(rng):
    """The production table matcher vmaps over pairs — the kernel must batch."""
    qs = rng.integers(0, 256, (3, 256, 128)).astype(np.float32)
    dbs = rng.integers(0, 256, (3, 512, 128)).astype(np.float32)
    cnts = np.array([400, 512, 257], np.int32)
    f = jax.vmap(lambda a, b, c: two_nn_pallas(a, b, c, interpret=True))
    d0v, i0v, d1v = f(jnp.asarray(qs), jnp.asarray(dbs), jnp.asarray(cnts))
    for p in range(3):
        d0x, i0x, d1x = two_nn(jnp.asarray(qs[p]), jnp.asarray(dbs[p]),
                               jnp.int32(cnts[p]), block=512)
        assert np.array_equal(np.asarray(i0v[p]), np.asarray(i0x))
        assert np.allclose(np.asarray(d0v[p]), np.asarray(d0x))
        assert np.allclose(np.asarray(d1v[p]), np.asarray(d1x))


def test_pallas_two_nn_matches_xla(rng):
    """Interpret-mode check of the fused kernel against the XLA path."""
    q = rng.integers(0, 256, (512, 128)).astype(np.float32)
    db = rng.integers(0, 256, (1024, 128)).astype(np.float32)
    n_valid = 900
    d0p, i0p, d1p = two_nn_pallas(jnp.asarray(q), jnp.asarray(db),
                                  jnp.int32(n_valid), interpret=True)
    d0x, i0x, d1x = two_nn(jnp.asarray(q), jnp.asarray(db),
                           jnp.int32(n_valid), block=512)
    assert np.array_equal(np.asarray(i0p), np.asarray(i0x))
    assert np.allclose(np.asarray(d0p), np.asarray(d0x))
    assert np.allclose(np.asarray(d1p), np.asarray(d1x))


def test_pallas_two_nn_int8_path(rng):
    """Centered-int8 descriptors (the production uint8 collection format)
    through the streamed-db kernel: bit-identical integer distances."""
    q8 = (rng.integers(0, 256, (256, 128)) - 128).astype(np.int8)
    db8 = (rng.integers(0, 256, (1536, 128)) - 128).astype(np.int8)
    n_valid = 1400
    d0p, i0p, d1p = two_nn_pallas(jnp.asarray(q8), jnp.asarray(db8),
                                  jnp.int32(n_valid), interpret=True)
    d0x, i0x, d1x = two_nn(jnp.asarray(q8), jnp.asarray(db8),
                           jnp.int32(n_valid), block=512)
    assert np.array_equal(np.asarray(i0p), np.asarray(i0x))
    assert np.array_equal(np.asarray(d0p), np.asarray(d0x))
    assert np.array_equal(np.asarray(d1p), np.asarray(d1x))


def test_pallas_two_nn_resident_fori_band(rng, monkeypatch):
    """The middle tier — db VMEM-resident but above the oneblock cap
    (16k < Nd <= 64k keys int8 in production) — runs the fori-over-BD-blocks
    kernel.  Forced here by dropping the oneblock cap so the band is covered
    at test shapes; production-band shapes only fit real TPU VMEM."""
    import bundler_sfm_tpu.ops.matching_pallas as mp
    monkeypatch.setattr(mp, "_ONEBLOCK_MAX_ND", 0)
    q8 = (rng.integers(0, 256, (512, 128)) - 128).astype(np.int8)
    db8 = (rng.integers(0, 256, (1536, 128)) - 128).astype(np.int8)
    n_valid = 1300
    d0p, i0p, d1p = mp.two_nn_pallas(jnp.asarray(q8), jnp.asarray(db8),
                                     jnp.int32(n_valid), interpret=True)
    d0x, i0x, d1x = two_nn(jnp.asarray(q8), jnp.asarray(db8),
                           jnp.int32(n_valid), block=512)
    assert np.array_equal(np.asarray(i0p), np.asarray(i0x))
    assert np.array_equal(np.asarray(d0p), np.asarray(d0x))
    assert np.array_equal(np.asarray(d1p), np.asarray(d1x))


def test_pallas_oneblock_vmem_footprint_gate(rng):
    """f32 dbs near the resident cap must NOT take the oneblock path: the
    [TQ_OB, Nd] f32 score tile plus an 8 MB f32 db exceeds 16 MB VMEM parts.
    The gate must fall back (footprint), while int8 at the same Nd stays
    oneblock-eligible."""
    import bundler_sfm_tpu.ops.matching_pallas as mp
    nd = mp._ONEBLOCK_MAX_ND
    f32_bytes = (nd * 128 * 4 + 4 * mp.TQ_OB * nd + 4 * nd
                 + mp.TQ_OB * 128 * 4 + 3 * 4 * 256)
    i8_bytes = (nd * 128 + 4 * mp.TQ_OB * nd + 4 * nd
                + mp.TQ_OB * 128 + 3 * 4 * 256)
    assert f32_bytes > 12 * 1024 * 1024    # f32 at the cap: ineligible
    assert i8_bytes <= 12 * 1024 * 1024    # int8 at the cap: still oneblock


def test_pallas_two_nn_streamed_path(rng, monkeypatch):
    """Force the HBM-streamed variant (db over the resident threshold) and
    check it against the XLA path — the big-collection shape."""
    import bundler_sfm_tpu.ops.matching_pallas as mp
    monkeypatch.setattr(mp, "_RESIDENT_DB_BYTES", 1)
    q = rng.integers(0, 256, (256, 128)).astype(np.float32)
    db = rng.integers(0, 256, (1536, 128)).astype(np.float32)
    n_valid = 1200
    d0p, i0p, d1p = mp.two_nn_pallas(jnp.asarray(q), jnp.asarray(db),
                                     jnp.int32(n_valid), interpret=True)
    d0x, i0x, d1x = two_nn(jnp.asarray(q), jnp.asarray(db),
                           jnp.int32(n_valid), block=512)
    assert np.array_equal(np.asarray(i0p), np.asarray(i0x))
    assert np.allclose(np.asarray(d0p), np.asarray(d0x))
    assert np.allclose(np.asarray(d1p), np.asarray(d1x))
