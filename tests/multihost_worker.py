"""Worker for the 2-process jax.distributed CPU test (SURVEY.md §4).

Launched by tests/test_multihost.py as:
    python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process contributes 4 virtual CPU devices; the global 8-device mesh
spans both processes, so every psum/all_gather in the sharded BA crosses
the process boundary — the DCN leg of the collective design.
"""

import os
import sys

PID = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = sys.argv[3]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception as e:  # pragma: no cover - jaxlib without gloo
    print(f"SKIP: no gloo collectives ({e})", flush=True)
    sys.exit(3)

import bundler_sfm_tpu  # noqa: E402,F401  (x64 + cache config)
from bundler_sfm_tpu.parallel.mesh import initialize_multihost  # noqa: E402

try:
    initialize_multihost(f"127.0.0.1:{PORT}", NPROC, PID)
except Exception as e:  # pragma: no cover
    print(f"SKIP: jax.distributed init failed ({e})", flush=True)
    sys.exit(3)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    devs = jax.devices()
    local = jax.local_devices()
    assert len(devs) == 4 * NPROC, (len(devs), NPROC)
    assert len(local) == 4
    mesh = Mesh(np.array(devs), ("shard",))

    def globalize(arr, spec):
        if arr is None:
            return None
        arr = np.asarray(arr)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])

    # --- Distributed BA across the two processes ---
    from __graft_entry__ import _synthetic_problem
    from bundler_sfm_tpu.ops.ba import BAProblem
    from bundler_sfm_tpu.parallel.ba_sharded import (
        _SHARDED_FIELDS, run_ba_sharded, shard_problem,
    )
    R0, cam0, pts0, oc, op, oxy = _synthetic_problem(num_cams=3, num_pts=64)
    prob = shard_problem(R0, cam0, pts0, oc, op, oxy,
                         num_shards=len(devs), est_distortion=False)
    probG = BAProblem(**{
        f: globalize(getattr(prob, f),
                     P("shard") if f in _SHARDED_FIELDS else P())
        for f in BAProblem._fields})
    res = run_ba_sharded(probG, mesh, max_iters=5)
    cost = float(res.cost)           # replicated output
    cam = np.asarray(res.cam)
    assert np.isfinite(cost), cost
    assert np.isfinite(cam).all()

    # Single-process reference on the same data for a quality check.
    from bundler_sfm_tpu.ops.ba import build_problem, run_ba
    ref = run_ba(build_problem(R0, cam0, pts0, oc, op, oxy,
                               est_distortion=False), max_iters=5)
    assert abs(cost - float(ref.cost)) <= 1e-6 * max(1.0, float(ref.cost)), \
        (cost, float(ref.cost))

    # --- Sharded matcher kernel across the two processes ---
    from bundler_sfm_tpu.parallel.matching_sharded import _match_sharded
    rng = np.random.default_rng(0)
    A = rng.integers(0, 256, (len(devs), 128, 128)).astype(np.float32)
    B = np.roll(A, 1, axis=0) + 0.0
    ca = np.full(len(devs), 128, np.int32)
    cb = np.full(len(devs), 128, np.int32)
    i0, acc = _match_sharded(
        globalize(A, P("shard")), globalize(B, P("shard")),
        globalize(ca, P("shard")), globalize(cb, P("shard")),
        jnp.float32(0.36), mesh, 128)
    for s in acc.addressable_shards:
        assert np.asarray(s.data).dtype == np.bool_

    print(f"MULTIHOST_OK pid={PID} cost={cost:.6e}", flush=True)


if __name__ == "__main__":
    main()
