"""Probe: production table matcher with/without the fused Pallas 2-NN on TPU.

Must be run TWICE in separate processes (the dispatch gate is read at trace
time; flipping it in-process would not invalidate the jit cache):

    python tests/probe_pallas_prod.py pallas
    BUNDLER_NO_PALLAS_MATCH=1 python tests/probe_pallas_prod.py xla

Each run saves outputs to /tmp/probe_pallas_<tag>.npz and prints the
second-consecutive-run wall (axon: vary inputs per call; first run pays
remote warmup).  Compare with:  python tests/probe_pallas_prod.py compare
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__)))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

tag = sys.argv[1] if len(sys.argv) > 1 else "pallas"

if tag == "compare":
    a = np.load("/tmp/probe_pallas_pallas.npz")
    b = np.load("/tmp/probe_pallas_xla.npz")
    same = all(np.array_equal(a[k], b[k]) for k in a.files)
    print("outputs identical:", same)
    sys.exit(0 if same else 1)

import jax
import bundler_sfm_tpu  # noqa: F401
from bundler_sfm_tpu.ops import matching

print("backend:", jax.default_backend(), "tag:", tag, flush=True)

rng = np.random.default_rng(0)
N_IMG, K = 16, 2048
descs = [rng.integers(0, 256, (rng.integers(1500, K + 1), 128)).astype(np.uint8)
         for _ in range(N_IMG)]
pairs = [(i, j) for i in range(N_IMG) for j in range(i + 1, N_IMG)]  # 120

tab = matching.DescriptorTable(descs)
t0 = time.time()
res1 = tab.match_pairs(pairs, batch=128)
print("first call: %.1fs" % (time.time() - t0), flush=True)

pairs2 = pairs[::-1]
t0 = time.time()
res2 = tab.match_pairs(pairs2, batch=128)
dt = time.time() - t0
print("%s 2nd run: %.3fs (%d pairs, %.0f pairs/s)"
      % (tag, dt, len(pairs2), len(pairs2) / dt), flush=True)

np.savez("/tmp/probe_pallas_%s.npz" % tag,
         **{f"{i}_{j}": res1[(i, j)] for (i, j) in res1})
