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
# 64 images (2016 pairs): the 24-image/276-pair shape measured the tunnel,
# not the matcher — fixed per-run costs (dispatch RTT ~27 ms, per-fetch
# overhead ~25 ms) were >40% of its wall (probe_match_e2e.py, round 4).
# The reference denominator below is re-measured at these conditions.
NUM_IMAGES = int(os.environ.get("BENCH_NUM_IMAGES", "64"))
_DEF_PAIRS = NUM_IMAGES * (NUM_IMAGES - 1) // 2
# 1024 pairs/dispatch = DescriptorTable's production Pallas default.
TPU_BATCH = int(os.environ.get("BENCH_TPU_BATCH",
                               str(min(1024, _DEF_PAIRS))))
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
    # Warmup / compile — on REVERSED pair order so the timed runs below are
    # not identical (executable, inputs) calls: the axon client memoizes
    # those and a memoized replay measures nothing.  Best-of-3 distinct
    # orders: single timed runs through the tunnel jitter 2-3x
    # (remote-side program/link warmth — CLAUDE.md timing traps).
    _ = table.match_pairs(pairs[::-1], batch=TPU_BATCH, min_matches=16)
    dt = 1e9
    for k in (0, 1, 2):
        ps = pairs[k:] + pairs[:k]
        t0 = time.perf_counter()
        out = table.match_pairs(ps, batch=TPU_BATCH, min_matches=16)
        dt = min(dt, time.perf_counter() - t0)
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


def bench_tpu_kernel(table, pairs, reps: int = 8):
    """Device-rate measurement of the matcher kernel itself: inputs are
    already device-resident (the production DescriptorTable path), chunks
    enqueued back-to-back, synced once.  The timed window runs the pair
    list `reps` times (distinct orders — the axon client memoizes identical
    (executable, inputs) calls) so the per-dispatch tunnel RTT amortizes:
    at one 276-pair dispatch the RTT floor alone caps the 'kernel' rate at
    ~8k pairs/s regardless of kernel speed (round-4 probe), which is what
    round 3 misread as 2% MFU."""
    import jax
    import jax.numpy as jnp
    from bundler_sfm_tpu.ops.matching import _match_pairs_from_table_masked

    # One dispatch per rep: the fused kernel never materializes [B, K, K]
    # tiles, so the full pair list fits one program (probe ran 2208 pairs/
    # dispatch); chunking at TPU_BATCH added 16 dispatch RTTs ~0.4 s here.
    KB = len(pairs)

    def run(orders):
        outs = []
        for r, ps in enumerate(orders):
            for s in range(0, len(ps), KB):
                chunk = ps[s:s + KB]
                pi = jnp.asarray(np.array([i for i, _ in chunk], np.int32))
                pj = jnp.asarray(np.array([j for _, j in chunk], np.int32))
                outs.append(_match_pairs_from_table_masked(
                    table.table, table.counts, pi, pj, jnp.float32(0.36),
                    table.block))
        # Device executions are in-order, so syncing the LAST chunk syncs
        # them all — per-chunk tiny fetches each pay ~25 ms of tunnel
        # overhead (probe_fetch.py), which swamped the kernel rate here.
        np.asarray(outs[-1][0, :8])

    def orders(phase):
        return [pairs[k:] + pairs[:k] for k in range(phase, phase + reps)]

    run(orders(reps))          # warm (distinct inputs)
    t0 = time.perf_counter()
    run(orders(0))
    dt = time.perf_counter() - t0
    n = reps * len(pairs)
    K = table.table.shape[1]
    flops = n * 2.0 * K * K * 128
    int8 = table.table.dtype == jnp.int8
    return n / dt, flops / dt, flops / dt / _device_peak_flops(int8)


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


def _bench_ba_sparse(ge, num_cams=64, num_pts=16384, max_iters=30,
                     seed=7):
    """Realistic-sparsity BA leg: mixed track lengths (60% 2-4 views, 25%
    5-8, 15% 9-24 — the from-pixels density, mean ~5.5) instead of the
    fully-dense shapes of the other legs.  The single-M slot layout runs at
    ~20% occupancy here (the regime round 4's bench structurally could not
    see); the view-bucketed layout is what the production pipeline
    dispatches.  Reports BOTH rates over REAL observations so a regression
    in padded-slot handling shows in the per-round JSON."""
    import jax.numpy as jnp
    from bundler_sfm_tpu.ops.ba import (
        build_problem, plan_view_buckets, run_ba,
    )
    rng = np.random.default_rng(seed)
    R0, cam0, pts0, oc, op, oxy = ge._synthetic_problem(num_cams=num_cams,
                                                        num_pts=num_pts)
    # Subsample views per point to the mixture (dense arrays are
    # point-major [C*P] with op = tile(arange(P), C)).
    u = rng.random(num_pts)
    nv = np.where(u < 0.6, rng.integers(2, 5, num_pts),
                  np.where(u < 0.85, rng.integers(5, 9, num_pts),
                           rng.integers(9, 25, num_pts)))
    rank = np.argsort(rng.random((num_cams, num_pts)), axis=0)
    keep = (rank < nv[None, :]).reshape(-1)
    oc, op, oxy = oc[keep], op[keep], oxy[keep]
    order = np.argsort(op, kind="stable")
    oc, op, oxy = oc[order], op[order], oxy[order]
    O = len(oc)

    def run_one(view_buckets, row_of, n_rows):
        if view_buckets is None:
            prob = build_problem(R0, cam0, pts0, oc, op, oxy,
                                 est_focal=True, est_distortion=True,
                                 dtype=np.float32)
            prob2 = build_problem(R0, cam0 + 1e-6, pts0, oc, op, oxy,
                                  est_focal=True, est_distortion=True,
                                  dtype=np.float32)
        else:
            pts_r = np.zeros((n_rows, 3))
            pts_r[row_of] = pts0
            op2 = row_of[op].astype(np.int32)
            prob = build_problem(R0, cam0, pts_r, oc, op2, oxy,
                                 est_focal=True, est_distortion=True,
                                 view_buckets=view_buckets,
                                 dtype=np.float32)
            prob2 = build_problem(R0, cam0 + 1e-6, pts_r, oc, op2, oxy,
                                  est_focal=True, est_distortion=True,
                                  view_buckets=view_buckets,
                                  dtype=np.float32)
        res = run_ba(prob, max_iters=max_iters)          # compile
        float(np.asarray(res.cost))
        t0 = time.perf_counter()
        res = run_ba(prob2, max_iters=max_iters)
        float(np.asarray(res.cost))
        dt = time.perf_counter() - t0
        iters = max(int(res.iters), 1)
        slots = prob.obs_cam.shape[0]
        return iters * O / dt, O / slots

    plan = plan_view_buckets(op, num_pts)
    single_rate, single_occ = run_one(None, None, None)
    if plan is None:
        return single_rate, single_occ, None, None
    row_of, buckets, n_rows = plan
    bucket_rate, bucket_occ = run_one(buckets, row_of, n_rows)
    return single_rate, single_occ, bucket_rate, bucket_occ


def bench_ba():
    """BA throughput at THREE shapes: 8 cams / 16k obs (a small incremental
    round, latency regime), 64 cams / 512k obs (the production regime the
    windowed-Schur work targets), and the realistic-sparsity leg (mixed
    track lengths at ~20% single-layout occupancy — the regime where the
    view-bucketed layout earns its keep)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ge", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "__graft_entry__.py"))
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    small = _bench_ba_shape(ge, 8, 2048)
    big = _bench_ba_shape(ge, 64, 8192)
    sparse = _bench_ba_sparse(ge)
    return small, big, sparse


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
        ((ba_rate, ba_iter_s, ba_mfu), (ba_rate64, ba_iter_s64, ba_mfu64),
         (bas_single, bas_socc, bas_bucket, bas_bocc)) = bench_ba()
    except Exception:
        ba_rate, ba_iter_s, ba_mfu = None, None, None
        ba_rate64, ba_iter_s64, ba_mfu64 = None, None, None
        bas_single = bas_socc = bas_bucket = bas_bocc = None

    try:
        cpu_rate, cpu_matches, cpu_dt = bench_cpu_kdtree(descs,
                                                         pairs[:CPU_PAIRS])
    except Exception:
        cpu_rate = None

    # Honest baseline: the reference's OWN matcher (KeyMatchFull, capped
    # ANN) measured on this dataset/host — NOT the far slower exact scipy
    # kd-tree stand-in (kept in detail).  Round-4 re-measurement
    # (benchmarks/probes/ref_ann_rate.py, sums EVERY per-database-image
    # "Matching took" line KeyMatchFull prints): 11.5 pairs/s at 64 imgs,
    # 12.0 at 24 imgs.  Rounds 1-3 used 118 pairs/s — a misread of ONE
    # per-image timer line (the last tree's 23 pairs in 2.33 s) as the
    # whole 276-pair run; the 28.6 s wall recorded alongside it already
    # contradicted that figure.  vs_baseline was therefore ~10x
    # UNDERSTATED in BENCH_r01-r03.  The constant is only comparable at
    # ITS measurement conditions; vs_baseline is nulled off-shape.
    REF_ANN = 11.5
    ref_ann_shape = (64, 2048)
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
                                   "source": "probes/ref_ann_rate.py "
                                             "round-4 (corrects r1's 118: "
                                             "one per-image timer misread "
                                             "as the run total)"},
            "ba_obs_iters_per_s": round(ba_rate) if ba_rate else None,
            "ba_seconds_per_lm_iter": round(ba_iter_s, 5) if ba_iter_s
            else None,
            "ba_mfu": round(ba_mfu, 4) if ba_mfu else None,
            "ba64_obs_iters_per_s": round(ba_rate64) if ba_rate64 else None,
            "ba64_seconds_per_lm_iter": round(ba_iter_s64, 5) if ba_iter_s64
            else None,
            "ba64_mfu": round(ba_mfu64, 4) if ba_mfu64 else None,
            # Realistic-sparsity leg (mixed track lengths, real-obs rates).
            "ba_sparse_bucketed_obs_iters_per_s":
                round(bas_bucket) if bas_bucket else None,
            "ba_sparse_single_obs_iters_per_s":
                round(bas_single) if bas_single else None,
            "ba_sparse_bucketed_occupancy":
                round(bas_bocc, 3) if bas_bocc else None,
            "ba_sparse_single_occupancy":
                round(bas_socc, 3) if bas_socc else None,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
