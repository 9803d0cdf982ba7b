"""Probe: device->host fetch strategies through the tunnel.

Measures: (a) single np.asarray of one [276, 2048] int16 result,
(b) the same bytes fetched as k row-slices from k threads (does the
tunnel multiplex streams?), (c) a bit-packed 1.5 B/query wire format
(low byte + packed high nibbles) vs the 2 B/query int16 row.

    python benchmarks/probes/probe_fetch.py
"""

import concurrent.futures as cf
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__)))),
                          ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    P, K = 276, 2048
    rng = np.random.default_rng(0)
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    @jax.jit
    def make(x):
        return (x + 1).astype(jnp.int16)

    @jax.jit
    def make_packed(x):
        m = (x + 1).astype(jnp.int32) & 0x7FF        # 11-bit indices
        lo = (m & 0xFF).astype(jnp.uint8)            # [P, K]
        hi = (m >> 8).astype(jnp.uint8)              # 3 bits each
        hi2 = (hi[:, 0::2] | (hi[:, 1::2] << 4))     # [P, K/2]
        return lo, hi2

    for trial in range(2):
        x = jnp.asarray(rng.integers(0, 2000, (P, K), dtype=np.int32))
        m = make(x)
        np.asarray(m[0, :4])
        t0 = time.perf_counter()
        a = np.asarray(m)
        t_single = time.perf_counter() - t0

        x = jnp.asarray(rng.integers(0, 2000, (P, K), dtype=np.int32))
        m = make(x)
        np.asarray(m[0, :4])
        for nthreads in (2, 4, 8):
            rows = np.array_split(np.arange(P), nthreads)
            slices = [m[r[0]:r[-1] + 1] for r in rows]
            for s in slices:
                s.block_until_ready() if hasattr(s, "block_until_ready") \
                    else None
            t0 = time.perf_counter()
            with cf.ThreadPoolExecutor(nthreads) as ex:
                parts = list(ex.map(np.asarray, slices))
            t_thr = time.perf_counter() - t0
            if trial:
                print(f"threads={nthreads}: {t_thr*1e3:6.1f} ms "
                      f"({P*K*2/t_thr/1e6:.1f} MB/s)", flush=True)

        x = jnp.asarray(rng.integers(0, 2000, (P, K), dtype=np.int32))
        lo, hi2 = make_packed(x)
        np.asarray(lo[0, :4])
        t0 = time.perf_counter()
        a2, b2 = np.asarray(lo), np.asarray(hi2)
        t_packed = time.perf_counter() - t0
        if trial:
            print(f"single int16 [{P},{K}]: {t_single*1e3:6.1f} ms "
                  f"({P*K*2/t_single/1e6:.1f} MB/s)", flush=True)
            print(f"packed 1.5B/query:     {t_packed*1e3:6.1f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
