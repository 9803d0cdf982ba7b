"""Host-tail benchmark for the ring matcher at 1024 images: the round-4
decode was an O(D·R·I·I) Python loop with per-lane int() conversions and
every executed rotation matched all I×I lanes then filtered to the
requested list (VERDICT r4 weak #5).  Round 5: vectorized argwhere decode +
a device-side requested-pair lane mask.

Runs on the 8-device virtual CPU mesh (no TPU needed — the probe times the
HOST side).  Usage: python benchmarks/probes/probe_ring_decode.py [N] [K]
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import bundler_sfm_tpu  # noqa: F401
import jax

jax.config.update("jax_platforms", "cpu")

from bundler_sfm_tpu.parallel.matching_sharded import ShardedDescriptorTable
from bundler_sfm_tpu.parallel.mesh import make_mesh


def main(N=1024, K=64, radius=3):
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (K, 128)).astype(np.uint8)
    descs = []
    for _ in range(N):
        jit = rng.integers(-5, 6, base.shape)
        descs.append(np.clip(base.astype(np.int32) + jit, 0, 255)
                     .astype(np.uint8)[rng.permutation(K)])
    pairs = [(j, i) for i in range(N) for j in range(max(0, i - radius), i)]
    mesh = make_mesh()
    table = ShardedDescriptorTable(descs, mesh, block=64)
    t0 = time.perf_counter()
    out = table.match_pairs(pairs, min_matches=1, max_out=K)
    wall = time.perf_counter() - t0
    total = sum(len(v) for v in out.values())
    print(f"N={N} pairs={len(pairs)}: match_pairs wall {wall:.2f}s "
          f"({len(out)} pairs kept, {total} matches) — wall includes the "
          f"VIRTUAL-CPU device compute, absent on real TPU")
    # Decode-only timing (the host tail under test): replay the decode on
    # the fetched grids.
    from bundler_sfm_tpu.parallel import matching_sharded as ms
    import jax.numpy as jnp
    from bundler_sfm_tpu.parallel.mesh import fetch, globalize
    from jax.sharding import PartitionSpec as P
    D = mesh.devices.size
    I = table.images_per_shard
    pa = np.array([a for a, _ in pairs], np.int64)
    pb = np.array([b for _, b in pairs], np.int64)
    num_rots = 1 + int((((pb // I) - (pa // I)) % D).max())
    lane_want = np.zeros((D, num_rots, I, I), bool)
    lane_want[pa // I, (pb // I - pa // I) % D, pa % I, pb % I] = True
    m, c = ms._ring_match_all_pairs(
        table.table, table.counts, jnp.float32(0.36), mesh, table.block,
        K, jnp.int16, num_rots,
        globalize(lane_want, mesh, P(ms.AXIS)))
    m = fetch(m, mesh)
    c = fetch(c, mesh)
    t0 = time.perf_counter()
    out2 = {}
    hits = np.argwhere(c >= 1)
    dd, rr, qq, ii = hits.T
    gi = dd * I + qq
    gj = ((dd + rr) % D) * I + ii
    ns = c[dd, rr, qq, ii]
    for k in range(len(hits)):
        out2[(int(gi[k]), int(gj[k]))] = \
            m[dd[k], rr[k], qq[k], ii[k], :ns[k]].astype(np.int32)
    print(f"decode-only ({len(hits)} surviving pairs): "
          f"{time.perf_counter() - t0:.3f}s")


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    main(N, K)
