"""Probe: end-to-end match_pairs rate (dispatch + kernel + masked-row fetch
+ host decode) vs pairs-per-dispatch batch size, on the real chip.

The e2e number is transfer-bound through the tunnel (~1.1 MB of int16
masked rows for 276 pairs at 15-45 MB/s); smaller batches let fetches of
early chunks overlap compute of later ones (match_pairs enqueues all
chunks before fetching any).

    python benchmarks/probes/probe_match_e2e.py [keys]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__)))),
                          ".jax_cache"))
os.environ.setdefault("BUNDLER_PALLAS_MATCH", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_img = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    batches = ([int(b) for b in sys.argv[3].split(",")]
               if len(sys.argv) > 3 else [276, 138, 92, 69, 46, 23])
    import jax
    from bundler_sfm_tpu.ops.matching import DescriptorTable

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (K, 128)).astype(np.int32)
    descs = [np.clip(base + rng.integers(-6, 7, base.shape), 0, 255
                     ).astype(np.uint8)[rng.permutation(K)]
             for _ in range(n_img)]
    pairs = [(i, j) for i in range(n_img) for j in range(i + 1, n_img)]
    table = DescriptorTable(descs)
    print(f"platform: {jax.devices()[0].platform} P={len(pairs)} K={K}",
          flush=True)

    for b in batches:
        # Warm every chunk shape with a distinct pair order.
        table.match_pairs(pairs[::-1], batch=b, min_matches=16)
        best = 1e9
        for k in (1, 2, 3):
            ps = pairs[k:] + pairs[:k]
            t0 = time.perf_counter()
            out = table.match_pairs(ps, batch=b, min_matches=16)
            best = min(best, time.perf_counter() - t0)
        nm = sum(len(v) for v in out.values())
        print(f"batch={b:4d}  pairs/s: {len(pairs)/best:7.0f}  "
              f"wall: {best*1e3:6.1f} ms  matches: {nm}", flush=True)


if __name__ == "__main__":
    main()
