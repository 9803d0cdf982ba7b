"""MEASURED multi-device scaling of the sharded BA on the virtual CPU mesh.

Complements benchmarks/scaling.py (measured per-shard compute + analytic ICI
model on the single real chip): here the whole sharded program — including
every real psum/all_gather — executes on a D-device mesh (virtual CPU
devices; XLA inserts the same collectives it would on ICI, over shared
memory).  Host cores are oversubscribed at D > #cores, so ABSOLUTE times are
not chip times; what this measures honestly is how collective count/size
scales with D and that efficiency does not collapse — the trend term that
scaling.py's analytic model cannot observe.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling_mesh_cpu.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from benchmarks.probes.probe_ba_scaling import synthetic
    from bundler_sfm_tpu.parallel.ba_sharded import (
        run_ba_sharded, shard_problem,
    )

    devs = jax.devices()
    C, P, V = 16, 16384, 6
    R0, cam0, pts0, oc, op, oxy = synthetic(C, P, V)
    out = {}
    for D in (1, 2, 4, 8):
        if D > len(devs):
            break
        mesh = Mesh(np.array(devs[:D]), ("shard",))
        prob = shard_problem(R0, cam0, pts0, oc, op, oxy, num_shards=D,
                             est_focal=True, est_distortion=True,
                             dtype=np.float32)
        res = run_ba_sharded(prob, mesh, max_iters=10)   # compile+warm
        float(np.asarray(res.cost))
        prob2 = shard_problem(R0, cam0 + 1e-6, pts0, oc, op, oxy,
                              num_shards=D, est_focal=True,
                              est_distortion=True, dtype=np.float32)
        t0 = time.perf_counter()
        res = run_ba_sharded(prob2, mesh, max_iters=10)
        float(np.asarray(res.cost))
        dt = time.perf_counter() - t0
        it = max(int(res.iters), 1)
        out[D] = round(dt / it * 1e3, 2)
        print(f"D={D}: {dt/it*1e3:.1f} ms/iter ({it} iters)", flush=True)
    host_cores = os.cpu_count()
    print(json.dumps({
        "metric": "measured_mesh_ms_per_iter_cpu",
        "host_cores": host_cores,
        "problem": {"cams": C, "pts": P, "obs": len(oc)},
        "ms_per_iter_by_devices": out,
    }))


if __name__ == "__main__":
    main()
