"""Probe: matcher end-to-end pairs/s vs (num_pairs, batch, block) through
the current backend — finds the dispatch/compute/wire sweet spot for
bench.py.  Run manually:

    python benchmarks/probes/probe_match_sweep.py
"""

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

K = 2048


def make_descs(rng, n):
    base = rng.integers(0, 256, (K, 128)).astype(np.int32)
    out = []
    for _ in range(n):
        jit = rng.integers(-6, 7, base.shape)
        d = np.clip(base + jit, 0, 255).astype(np.uint8)
        out.append(d[rng.permutation(K)])
    return out


def main():
    import jax
    from bundler_sfm_tpu.ops.matching import DescriptorTable
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    n_img = 48
    descs = make_descs(rng, n_img)
    pairs = [(i, j) for i in range(n_img) for j in range(i + 1, n_img)]
    configs = [
        (276, 276, 2048),
        (276, 276, 512),
        (552, 276, 2048),
        (1128, 282, 2048),
        (1128, 564, 512),
        (1128, 1128, 256),
    ]
    for (npairs, batch, block) in configs:
        table = DescriptorTable(descs, block=block)
        sub = pairs[:npairs]
        try:
            _ = table.match_pairs(sub[::-1], batch=batch, min_matches=16)
            t0 = time.perf_counter()
            out = table.match_pairs(sub, batch=batch, min_matches=16)
            dt = time.perf_counter() - t0
            print(f"pairs={npairs:5d} batch={batch:5d} block={block:5d}  "
                  f"{npairs/dt:8.1f} pairs/s  ({dt:.3f}s, "
                  f"{sum(len(v) for v in out.values())} matches)",
                  flush=True)
        except Exception as e:   # OOM etc.
            print(f"pairs={npairs} batch={batch} block={block}  FAILED: "
                  f"{type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
