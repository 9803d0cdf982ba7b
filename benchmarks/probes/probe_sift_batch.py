"""Probe: SIFT extraction throughput (keys/s, images/s) on a real image
set — the stage `RunBundler.sh:98-104` runs as per-image `sift` processes.

Run: python benchmarks/probes/probe_sift_batch.py [image_dir] [max_keys]

Times the SECOND call (axon pays per-program first-execution warmup) with
the same images — extract_sift_batch is shape-bucketed, so the warm run is
the steady-state per-collection cost a real pipeline pays.
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    import jax
    from bundler_sfm_tpu.features.sift import (
        extract_sift_batch, load_grayscale,
    )

    image_dir = sys.argv[1] if len(sys.argv) > 1 \
        else "/root/reference/examples/kermit"
    max_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    names = sorted(f for f in os.listdir(image_dir)
                   if f.lower().endswith((".jpg", ".jpeg")))
    grays = [load_grayscale(os.path.join(image_dir, n)) for n in names]
    print(f"platform: {jax.devices()[0].platform}  images: {len(grays)}  "
          f"dims: {grays[0].shape}", flush=True)

    for trial in range(2):
        t0 = time.perf_counter()
        results = extract_sift_batch(grays, max_keys_total=max_keys,
                                     contrast_thr=0.02)
        dt = time.perf_counter() - t0
        total_keys = sum(len(r[0]) for r in results)
        print(f"trial {trial}: {dt:7.2f}s  {total_keys} keys  "
              f"{total_keys / dt:9.0f} keys/s  "
              f"{len(grays) / dt:6.2f} images/s", flush=True)


if __name__ == "__main__":
    main()
