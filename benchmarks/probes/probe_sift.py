"""Probe: per-stage timing of extract_sift on one kermit image (real chip).

Run: python tests/probe_sift.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__)))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from bundler_sfm_tpu.features import sift

    img = sift.load_grayscale(
        "/root/reference/examples/kermit/kermit000.jpg")
    print("platform:", jax.devices()[0].platform, "img", img.shape, flush=True)

    # Whole extract, twice (second = warm).
    for trial in range(2):
        t0 = time.perf_counter()
        info, desc = sift.extract_sift(img, max_keys_total=4096,
                                       contrast_thr=0.02)
        dt = time.perf_counter() - t0
        print(f"extract_sift trial {trial}: {dt:6.2f}s  ({len(info)} keys)",
              flush=True)

    # Stage breakdown on octave 0.
    base = jnp.asarray(img, jnp.float32) / 255.0
    base = jax.image.resize(base, (img.shape[0] * 2, img.shape[1] * 2),
                            "bilinear")

    def timeit(fn, *a, n=5):
        out = fn(*a)
        jax.block_until_ready(out)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        return (time.perf_counter() - t0) / n

    t = timeit(lambda b: sift.build_octave(b), base)
    print(f"build_octave:   {t*1e3:8.1f} ms", flush=True)
    t = timeit(lambda b: sift.extract_octave(b, 4096, jnp.float32(0.02),
                                             jnp.float32(10.0)), base)
    print(f"extract_octave: {t*1e3:8.1f} ms", flush=True)

    # Transfer cost of the outputs.
    info, desc, valid, _ = sift.extract_octave(base, 4096, jnp.float32(0.02),
                                            jnp.float32(10.0))
    jax.block_until_ready(desc)
    t0 = time.perf_counter()
    np.asarray(info), np.asarray(desc), np.asarray(valid)
    print(f"host transfer:  {(time.perf_counter()-t0)*1e3:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
