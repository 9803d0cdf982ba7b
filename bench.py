"""Benchmark: descriptor-matching throughput (pairs/s) on the TPU MXU vs the
reference's data path (ANN kd-tree 2-NN on CPU, approximated by scipy
cKDTree with identical query semantics).

Prints ONE JSON line:
  {"metric": "pairs_matched_per_s", "value": N, "unit": "pairs/s",
   "vs_baseline": X, ...}

The workload mirrors `KeyMatchFull` (`src/KeyMatchFull.cpp:105-151`): image
pairs with ~2k SIFT keys each, exact 2-NN + Lowe 0.6 ratio per query.
"""

import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: the driver re-runs this every round and the
# remote TPU compile path costs minutes per shape without it.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
# The fused Pallas matcher is gated off on the axon tunnel by default (its
# ~60s per-process executable load hurts one-shot runs); the bench warms
# every program before timing, so it measures the kernel's true rate.
os.environ.setdefault("BUNDLER_PALLAS_MATCH", "1")

KEYS_PER_IMAGE = 2048
NUM_IMAGES = int(os.environ.get("BENCH_NUM_IMAGES", "24"))
_DEF_PAIRS = NUM_IMAGES * (NUM_IMAGES - 1) // 2
TPU_BATCH = int(os.environ.get("BENCH_TPU_BATCH", str(_DEF_PAIRS)))
BLOCK = int(os.environ.get("BENCH_BLOCK", str(KEYS_PER_IMAGE)))
CPU_PAIRS = 2          # kd-tree pairs measured, rate extrapolated


def make_descriptors(rng, n_images, keys_per_image):
    """Realistic SIFT-like descriptors: cluster structure + per-view jitter
    so the ratio test passes at a realistic (~10-20%) rate."""
    base = rng.integers(0, 256, (keys_per_image, 128)).astype(np.int32)
    descs = []
    for _ in range(n_images):
        jit = rng.integers(-6, 7, base.shape)
        d = np.clip(base + jit, 0, 255).astype(np.uint8)
        perm = rng.permutation(keys_per_image)
        descs.append(d[perm])
    return descs


def bench_tpu(descs, pairs):
    import jax
    from bundler_sfm_tpu.ops.matching import DescriptorTable

    table = DescriptorTable(descs, block=BLOCK)
    # Warmup / compile — on REVERSED pair order so the timed run below is
    # not an identical (executable, inputs) call: the axon client memoizes
    # those and a memoized replay measures nothing.
    _ = table.match_pairs(pairs[::-1], batch=TPU_BATCH, min_matches=16)
    t0 = time.perf_counter()
    out = table.match_pairs(pairs, batch=TPU_BATCH, min_matches=16)
    dt = time.perf_counter() - t0
    return table, len(pairs) / dt, sum(len(v) for v in out.values()), dt


def _device_peak_flops(int8: bool) -> float:
    """Per-chip peak for MFU accounting (v5e: 197 TFLOP/s bf16, 394 TOPS
    int8; v4: 275 TFLOP/s bf16)."""
    import jax
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    if "v4" in kind:
        return 275e12
    if "v6" in kind or "trillium" in kind:
        return 918e12 * (2.0 if int8 else 1.0)
    # v5 lite / default
    return 197e12 * (2.0 if int8 else 1.0)


def bench_tpu_kernel(table, pairs):
    """Device-rate measurement of the matcher kernel itself: inputs are
    already device-resident (the production DescriptorTable path), one
    dispatch, timed on its second distinct-input run; the tunnel's
    per-dispatch RTT and the host decode loop are excluded from the e2e
    number's denominator but NOT from this one — it still includes one
    dispatch + one masked-row fetch, so it lower-bounds true device rate."""
    import jax
    import jax.numpy as jnp
    from bundler_sfm_tpu.ops.matching import _match_pairs_from_table_masked

    def run(ps):
        # Production chunking (match_pairs batch=256): the vmapped XLA path
        # materializes a [B, K, K] f32 distance tensor per dispatch, so one
        # giant batch would blow HBM; chunks are enqueued back-to-back and
        # synced once at the end (tiny slice fetch — excludes the full
        # masked-row transfer from the kernel rate).
        outs = []
        for s in range(0, len(ps), TPU_BATCH):
            chunk = ps[s:s + TPU_BATCH]
            pi = jnp.asarray(np.array([i for i, _ in chunk], np.int32))
            pj = jnp.asarray(np.array([j for _, j in chunk], np.int32))
            outs.append(_match_pairs_from_table_masked(
                table.table, table.counts, pi, pj, jnp.float32(0.36),
                table.block))
        for m in outs:
            np.asarray(m[0, :8])   # sync (axon block_until_ready unreliable)

    run(pairs[::-1])           # warm (distinct inputs)
    t0 = time.perf_counter()
    run(pairs)
    dt = time.perf_counter() - t0
    K = table.table.shape[1]
    flops = len(pairs) * 2.0 * K * K * 128
    int8 = table.table.dtype == jnp.int8
    return len(pairs) / dt, flops / dt, \
        flops / dt / _device_peak_flops(int8)


def bench_cpu_kdtree(descs, pairs):
    """The reference matcher's shape: build kd-tree on image2, 2-NN query
    every image1 key, ratio test (src/keys2a.cpp MatchKeys)."""
    from scipy.spatial import cKDTree
    t0 = time.perf_counter()
    total = 0
    for (i, j) in pairs:
        tree = cKDTree(descs[j].astype(np.float32))
        d, idx = tree.query(descs[i].astype(np.float32), k=2)
        accept = (d[:, 0] ** 2) < 0.36 * (d[:, 1] ** 2)
        total += int(accept.sum())
    dt = time.perf_counter() - t0
    return len(pairs) / dt, total, dt


def _bench_ba_shape(ge, num_cams, num_pts, max_iters=30):
    from bundler_sfm_tpu.ops.ba import build_problem, run_ba
    R0, cam0, pts0, oc, op, oxy = ge._synthetic_problem(num_cams=num_cams,
                                                        num_pts=num_pts)
    prob = build_problem(R0, cam0, pts0, oc, op, oxy, est_focal=True,
                         est_distortion=True, dtype=np.float32)
    res = run_ba(prob, max_iters=max_iters)   # compile
    float(np.asarray(res.cost))
    # Perturb the inputs for the timed run: the remote-TPU path memoizes
    # identical (executable, inputs) pairs, and its block_until_ready is not
    # a reliable sync — time a fresh problem and sync via a host transfer.
    prob2 = build_problem(R0, cam0 + 1e-6, pts0, oc, op, oxy,
                          est_focal=True, est_distortion=True,
                          dtype=np.float32)
    t0 = time.perf_counter()
    res = run_ba(prob2, max_iters=max_iters)
    float(np.asarray(res.cost))
    dt = time.perf_counter() - t0
    iters = max(int(res.iters), 1)
    # Algorithmic FLOPs per LM iteration (the dense-linear-algebra core;
    # excludes the one-hot expansion/reduction implementation overhead):
    # linearize ~r,A,B ~ 300/obs; U/V/W products ~ 240/obs; Schur dense
    # tables + (C*9)^2 contraction; solve C^3*729/3; back-substitute.
    C = prob.cam0.shape[0]
    O = prob.obs_cam.shape[0]
    P = prob.pts0.shape[0]
    flops_iter = (O * 540.0 + (C * 9) ** 2 * 3 * P * 2
                  + (C * 9) ** 3 / 3 + O * 110.0)
    mfu = flops_iter * iters / dt / _device_peak_flops(False)
    return iters * len(oc) / dt, dt / iters, mfu


def bench_ba():
    """BA throughput at TWO shapes: 8 cams / 16k obs (a small incremental
    round, latency regime) and 64 cams / 512k obs (the production regime the
    windowed-Schur work targets — regressions there must be visible in the
    per-round JSON, not masked by a toy shape)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ge", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "__graft_entry__.py"))
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    small = _bench_ba_shape(ge, 8, 2048)
    big = _bench_ba_shape(ge, 64, 8192)
    return small, big


def main():
    rng = np.random.default_rng(0)
    descs = make_descriptors(rng, NUM_IMAGES, KEYS_PER_IMAGE)
    pairs = [(i, j) for i in range(NUM_IMAGES)
             for j in range(i + 1, NUM_IMAGES)]

    import jax
    platform = jax.devices()[0].platform

    table, tpu_rate, tpu_matches, tpu_dt = bench_tpu(descs, pairs)
    try:
        kern_rate, kern_flops, kern_mfu = bench_tpu_kernel(table, pairs)
    except Exception:
        kern_rate, kern_flops, kern_mfu = None, None, None
    try:
        (ba_rate, ba_iter_s, ba_mfu), (ba_rate64, ba_iter_s64, ba_mfu64) \
            = bench_ba()
    except Exception:
        ba_rate, ba_iter_s, ba_mfu = None, None, None
        ba_rate64, ba_iter_s64, ba_mfu64 = None, None, None

    try:
        cpu_rate, cpu_matches, cpu_dt = bench_cpu_kdtree(descs,
                                                         pairs[:CPU_PAIRS])
    except Exception:
        cpu_rate = None

    # Honest baseline: the reference's OWN matcher (KeyMatchFull, capped
    # ANN) measured at 118 pairs/s on this dataset/host (BASELINE.md) —
    # NOT the far slower exact scipy kd-tree stand-in (kept in detail).
    # The constant is only comparable at ITS measurement conditions
    # (24 imgs x 2048 keys, bench.py's generator, this host class);
    # vs_baseline is nulled when the bench runs a different shape.
    REF_ANN = 118.0
    ref_ann_shape = (24, 2048)
    comparable = (NUM_IMAGES, KEYS_PER_IMAGE) == ref_ann_shape
    result = {
        "metric": "pairs_matched_per_s",
        "value": round(tpu_rate, 2),
        "unit": "pairs/s",
        "vs_baseline": round(tpu_rate / REF_ANN, 2) if comparable else None,
        "detail": {
            "platform": platform,
            "num_pairs": len(pairs),
            "keys_per_image": KEYS_PER_IMAGE,
            "tpu_seconds": round(tpu_dt, 3),
            "tpu_matches": int(tpu_matches),
            "kernel_pairs_per_s": round(kern_rate, 1) if kern_rate else None,
            "kernel_tflops": round(kern_flops / 1e12, 2) if kern_flops
            else None,
            "kernel_mfu": round(kern_mfu, 4) if kern_mfu else None,
            "cpu_kdtree_pairs_per_s": round(cpu_rate, 3) if cpu_rate else None,
            "vs_cpu_kdtree": round(tpu_rate / cpu_rate, 2) if cpu_rate
            else None,
            "ref_ann_pairs_per_s": REF_ANN,
            "ref_ann_conditions": {"num_images": ref_ann_shape[0],
                                   "keys_per_image": ref_ann_shape[1],
                                   "generator": "bench.make_descriptors",
                                   "source": "BASELINE.md round-1"},
            "ba_obs_iters_per_s": round(ba_rate) if ba_rate else None,
            "ba_seconds_per_lm_iter": round(ba_iter_s, 5) if ba_iter_s
            else None,
            "ba_mfu": round(ba_mfu, 4) if ba_mfu else None,
            "ba64_obs_iters_per_s": round(ba_rate64) if ba_rate64 else None,
            "ba64_seconds_per_lm_iter": round(ba_iter_s64, 5) if ba_iter_s64
            else None,
            "ba64_mfu": round(ba_mfu64, 4) if ba_mfu64 else None,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
