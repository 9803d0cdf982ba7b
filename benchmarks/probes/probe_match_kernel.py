"""Probe: pure matcher-kernel device rate with DEVICE-RESIDENT inputs.

Earlier probes uploaded fresh query tensors per timed call and measured
the tunnel's ~15-45 MB/s host link instead of the kernel (16 MB/run).
Here the descriptor table lives on device (production DescriptorTable
layout); timed calls vary only the tiny pair-index vectors, and the sync
fetches an 8-element slice.

    python benchmarks/probes/probe_match_kernel.py [pairs] [keys] [pallas]
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


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 276
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    use_pallas = (sys.argv[3] if len(sys.argv) > 3 else "pallas") == "pallas"
    if use_pallas:
        os.environ["BUNDLER_PALLAS_MATCH"] = "1"
    else:
        os.environ["BUNDLER_NO_PALLAS_MATCH"] = "1"

    import jax
    import jax.numpy as jnp
    from bundler_sfm_tpu.ops.matching import (DescriptorTable,
                                              _match_pairs_from_table_masked)

    rng = np.random.default_rng(0)
    n_img = 24
    base = rng.integers(0, 256, (K, 128)).astype(np.int32)
    descs = [np.clip(base + rng.integers(-6, 7, base.shape), 0, 255
                     ).astype(np.uint8)[rng.permutation(K)]
             for _ in range(n_img)]
    pairs = [(i, j) for i in range(n_img) for j in range(i + 1, n_img)][:P]
    table = DescriptorTable(descs)
    print(f"platform: {jax.devices()[0].platform} pallas={use_pallas} "
          f"P={len(pairs)} K={K} block={table.block}", flush=True)

    def run(ps):
        pi = jnp.asarray(np.array([i for i, _ in ps], np.int32))
        pj = jnp.asarray(np.array([j for _, j in ps], np.int32))
        m = _match_pairs_from_table_masked(table.table, table.counts,
                                           pi, pj, jnp.float32(0.36),
                                           table.block)
        np.asarray(m[0, :8])   # tiny sync fetch

    run(pairs)                 # compile + warm
    best = 1e9
    orders = [pairs[::-1], pairs[1:] + pairs[:1], pairs[2:] + pairs[:2]]
    for ps in orders:
        t0 = time.perf_counter()
        run(ps)
        best = min(best, time.perf_counter() - t0)
    flops = len(pairs) * 2.0 * K * K * 128
    print(f"pairs/s: {len(pairs)/best:.0f}  tflops: {flops/best/1e12:.2f}  "
          f"mfu_int8: {flops/best/394e12*100:.2f}%", flush=True)


if __name__ == "__main__":
    main()
