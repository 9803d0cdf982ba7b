import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bundler_sfm_tpu.ops.matching import two_nn
from bundler_sfm_tpu.ops.matching_pallas import two_nn_pallas


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
