"""Worker for the 2-process FULL-RECONSTRUCTION jax.distributed CPU test.

Launched by tests/test_multihost.py as:
    python tests/multihost_worker_e2e.py <process_id> <num_processes> <port>

Each process contributes 4 virtual CPU devices; the production pipeline
(compute_geometric_constraints + bundle_adjust_fast with num_devices=8)
runs identically on both processes — SPMD host discipline — so the fused
sharded BA outlier loop's psums and the output all-gathers cross the
process boundary, exactly a 2-host run of `run_bundler
--multihost_coordinator` minus the network.
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


def main():
    assert len(jax.devices()) == 4 * NPROC
    from tests.test_pipeline import make_pipeline_scene
    from bundler_sfm_tpu.config import default_pipeline_config
    from bundler_sfm_tpu.pipeline.incremental import bundle_adjust_fast
    from bundler_sfm_tpu.pipeline.verify import compute_geometric_constraints

    cfg = default_pipeline_config(
        num_devices=len(jax.devices()),
        fmatrix_rounds=256, homography_rounds=64, projection_rounds=256,
        sfm_max_iters=30)
    scene, syn = make_pipeline_scene(np.random.default_rng(7), num_cams=4,
                                     num_pts=150, seed_cfg=cfg)

    # Production ring matcher across the process boundary: the
    # image-sharded table's ppermute legs and the output all-gather cross
    # processes (run_bundler --num_devices dispatches this path).
    from bundler_sfm_tpu.parallel.matching_sharded import (
        ShardedDescriptorTable,
    )
    from bundler_sfm_tpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (96, 128)).astype(np.int32)
    descs = [np.clip(base + rng.integers(-4, 5, base.shape),
                     0, 255).astype(np.uint8) for _ in range(6)]
    ring = ShardedDescriptorTable(descs, make_mesh(), block=128)
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    got = ring.match_pairs(pairs, min_matches=1)
    n_matches = sum(len(v) for v in got.values())
    assert n_matches > 0

    compute_geometric_constraints(scene, seed=3)
    recon = bundle_adjust_fast(scene, seed=5)
    n_pts = sum(1 for v in recon.pt_views if v)
    centers = np.stack([recon.cam_params[s][0:3]
                        for s in range(recon.num_cameras)])
    digest = float(np.sum(np.abs(centers)))
    print(f"MULTIHOST_E2E_OK pid={PID} cams={recon.num_cameras} "
          f"pts={n_pts} ringmatches={n_matches} digest={digest:.9e}",
          flush=True)


if __name__ == "__main__":
    main()
