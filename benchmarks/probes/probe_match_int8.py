"""Probe: XLA two_nn f32/bf16 path vs centered-int8 path on the real chip.

Times the raw 2-NN kernel (no epilogue) and the production table matcher
with both table dtypes.  Run: python benchmarks/probes/probe_match_int8.py
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import bundler_sfm_tpu  # noqa: config side effects
import jax
import jax.numpy as jnp
from bundler_sfm_tpu.ops.matching import two_nn, _prep_desc

def timeit(fn, n=8):
    # warmup (twice — remote first-execution warmup) then best-of timings
    fn(0); fn(1)
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        fn(2 + i)
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts)//2]

def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    K = 2048
    base = rng.integers(0, 256, (16, K, 128), dtype=np.uint8)
    f32 = jnp.asarray(base.astype(np.float32))
    i8 = jnp.asarray(np.ascontiguousarray(
        (base.astype(np.int16) - 128).astype(np.int8)))

    for name, tab in (("f32/bf16", f32), ("int8", i8)):
        def run(i):
            d0, i0, d1 = two_nn(tab[i % 8], tab[(i % 8) + 8],
                                jnp.int32(K - 3), block=K)
            np.asarray(d0[:4])
        best, med = timeit(run)
        print(f"two_nn {name}: best {best*1e3:.2f} ms  med {med*1e3:.2f} ms",
              flush=True)

    # Batched-from-table matcher (production shape), 64 pairs per dispatch.
    from bundler_sfm_tpu.ops.matching import _match_pairs_from_table_compact
    for name, tab in (("f32", f32), ("int8", i8)):
        counts = jnp.full(16, K - 3, jnp.int32)
        def run(i):
            pi = jnp.asarray((np.arange(64) + i) % 16, jnp.int32)
            pj = jnp.asarray((np.arange(64) * 3 + i + 1) % 16, jnp.int32)
            m, cnt = _match_pairs_from_table_compact(
                tab, counts, pi, pj, jnp.float32(0.36), K, K, jnp.int16)
            np.asarray(cnt)
        best, med = timeit(run, n=6)
        print(f"table-compact {name} (64 pairs): best {best*1e3:.1f} ms "
              f"({best/64*1e3:.2f} ms/pair) med {med*1e3:.1f} ms", flush=True)

if __name__ == "__main__":
    main()
