"""Probe: fused 2-NN Pallas kernel VARIANTS, device-rate on the real chip.

Round-3/4 history: the production resident kernel measures ~7.5k pairs/s
(2048x2048 int8) = ~2% int8 MFU; the model says the VPU epilogue should
cost ~30 us/pair yet the kernel takes ~130 us.  Hypotheses probed here:

  base      production kernel (ops/matching_pallas.py resident path)
  bf16      int8 operands cast to bf16, f32 accumulation (EXACT for
            centered-int8: products <= 16384, sums <= 2.1M < 2^24) —
            tests whether Mosaic's int8 dot lowering is the bottleneck
  oneblock  bf16 dot + whole-db score tile [TQ, K] in one shot — no
            fori merge passes at all
  oneblock_int8   same epilogue, int8 dot (isolates dot dtype)
  tq512     oneblock with TQ=512 (fewer grid steps)

    python benchmarks/probes/probe_pallas_variants.py [pairs] [keys]
"""

import functools
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

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from bundler_sfm_tpu.ops.matching_pallas import (
        _BIG, _merge_top2, _tile_top2, two_nn_pallas)

    rng = np.random.default_rng(0)
    n_img = 24
    base = rng.integers(0, 256, (K, 128)).astype(np.int32)
    descs = [np.clip(base + rng.integers(-6, 7, base.shape), 0, 255
                     ).astype(np.uint8)[rng.permutation(K)]
             for _ in range(n_img)]
    table_np = np.stack([(d.astype(np.int16) - 128).astype(np.int8)
                         for d in descs])
    table = jax.device_put(table_np)
    counts = jax.device_put(np.full(n_img, K, np.int32))
    pairs = [(i, j) for i in range(n_img) for j in range(i + 1, n_img)]
    while len(pairs) < P:      # cycle for RTT-amortization probes (P > 276)
        pairs += pairs
    pairs = pairs[:P]
    print(f"platform: {jax.devices()[0].platform} P={len(pairs)} K={K}",
          flush=True)

    def one_block_kernel(tq, int8dot):
        def kern(q_ref, db_ref, bsq_ref, d0_ref, i0_ref, d1_ref):
            q = q_ref[:]
            if int8dot:
                dots = jax.lax.dot_general(
                    q, db_ref[:], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            else:
                dots = jax.lax.dot_general(
                    q.astype(jnp.bfloat16), db_ref[:].astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            m = dots - 0.5 * bsq_ref[0, :][None, :]
            col = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
            m0, i0l, m1 = _tile_top2(m, col)
            row = pl.program_id(0)
            qi = q.astype(jnp.int32)
            qsq = jnp.sum(qi * qi, axis=1).astype(jnp.float32)
            d0_ref[row, :] = qsq - 2.0 * m0
            i0_ref[row, :] = i0l
            d1_ref[row, :] = qsq - 2.0 * m1
        return kern

    def make_oneblock(tq, int8dot):
        def two_nn(q, db, bsq):
            nq = q.shape[0]
            return pl.pallas_call(
                one_block_kernel(tq, int8dot),
                grid=(nq // tq,),
                in_specs=[
                    pl.BlockSpec((tq, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(db.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, db.shape[0]), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=tuple(
                    pl.BlockSpec((nq // tq, tq), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM) for _ in range(3)),
                out_shape=(
                    jax.ShapeDtypeStruct((nq // tq, tq), jnp.float32),
                    jax.ShapeDtypeStruct((nq // tq, tq), jnp.int32),
                    jax.ShapeDtypeStruct((nq // tq, tq), jnp.float32),
                ),
            )(q, db, bsq)
        return two_nn

    # bf16-dot resident kernel with the production fori/merge structure
    def bf16_resident_kernel(q_ref, db_ref, bsq_ref, d0_ref, i0_ref, d1_ref):
        TQ, BD = 256, 512
        q = q_ref[:]
        qb = q.astype(jnp.bfloat16)
        num_blocks = db_ref.shape[0] // BD
        col = jax.lax.broadcasted_iota(jnp.int32, (TQ, BD), 1)

        def body(b, carry):
            start = b * BD
            dots = jax.lax.dot_general(
                qb, db_ref[pl.ds(start, BD), :].astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = dots - 0.5 * bsq_ref[0, pl.ds(start, BD)][None, :]
            m0, i0l, m1 = _tile_top2(m, col)
            return _merge_top2(*carry, m0, start + i0l, m1)

        init = (jnp.full((TQ,), -_BIG, jnp.float32),
                jnp.zeros((TQ,), jnp.int32),
                jnp.full((TQ,), -_BIG, jnp.float32))
        r0, ri, r1 = jax.lax.fori_loop(jnp.int32(0), jnp.int32(num_blocks),
                                       body, init)
        row = pl.program_id(0)
        qi = q.astype(jnp.int32)
        qsq = jnp.sum(qi * qi, axis=1).astype(jnp.float32)
        d0_ref[row, :] = qsq - 2.0 * r0
        i0_ref[row, :] = ri
        d1_ref[row, :] = qsq - 2.0 * r1

    def make_bf16_resident():
        TQ = 256
        def two_nn(q, db, bsq):
            nq = q.shape[0]
            return pl.pallas_call(
                bf16_resident_kernel,
                grid=(nq // TQ,),
                in_specs=[
                    pl.BlockSpec((TQ, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(db.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, db.shape[0]), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=tuple(
                    pl.BlockSpec((nq // TQ, TQ), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM) for _ in range(3)),
                out_shape=(
                    jax.ShapeDtypeStruct((nq // TQ, TQ), jnp.float32),
                    jax.ShapeDtypeStruct((nq // TQ, TQ), jnp.int32),
                    jax.ShapeDtypeStruct((nq // TQ, TQ), jnp.float32),
                ),
            )(q, db, bsq)
        return two_nn

    # --- epilogue ablations (NOT valid matchers — they bound the ceiling) --
    # The oneblock kernel is VPU-pass-bound: the [TQ, Nd] epilogue runs ~7
    # full-tile passes (m, max, eq, min-index, col-eq, masked max) against
    # one ~0.17 us MXU matmul per tile.  These ablations measure the cost
    # of each epilogue piece to document the measured ceiling.
    def ablation_kernel(mode):
        def kern(q_ref, db_ref, bsq_ref, d0_ref, i0_ref, d1_ref):
            tq = q_ref.shape[0]
            q = q_ref[:]
            dots = jax.lax.dot_general(
                q, db_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            row = pl.program_id(0)
            if mode == "matmul_max":        # matmul + ONE max reduction
                d0_ref[row, :] = jnp.max(dots, axis=1)
                i0_ref[row, :] = jnp.zeros((tq,), jnp.int32)
                d1_ref[row, :] = jnp.zeros((tq,), jnp.float32)
                return
            m = dots - 0.5 * bsq_ref[0, :][None, :]
            col = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
            m0 = jnp.max(m, axis=1)
            i0l = jnp.min(jnp.where(m == m0[:, None], col,
                                    jnp.int32(2 ** 30)), axis=1)
            if mode == "top1":              # full top-1, no second max
                qi = q.astype(jnp.int32)
                qsq = jnp.sum(qi * qi, axis=1).astype(jnp.float32)
                d0_ref[row, :] = qsq - 2.0 * m0
                i0_ref[row, :] = i0l
                d1_ref[row, :] = jnp.zeros((tq,), jnp.float32)
                return
        return kern

    def make_ablation(tq, mode):
        def two_nn(q, db, bsq):
            nq = q.shape[0]
            return pl.pallas_call(
                ablation_kernel(mode),
                grid=(nq // tq,),
                in_specs=[
                    pl.BlockSpec((tq, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(db.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, db.shape[0]), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=tuple(
                    pl.BlockSpec((nq // tq, tq), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM) for _ in range(3)),
                out_shape=(
                    jax.ShapeDtypeStruct((nq // tq, tq), jnp.float32),
                    jax.ShapeDtypeStruct((nq // tq, tq), jnp.int32),
                    jax.ShapeDtypeStruct((nq // tq, tq), jnp.float32),
                ),
            )(q, db, bsq)
        return two_nn

    def batched(two_nn_fn):
        @jax.jit
        def run(table, counts, pi, pj):
            with jax.enable_x64(False):
                def one(i, j):
                    db = table[j]
                    bi = db.astype(jnp.int32)
                    bsq = jnp.sum(bi * bi, axis=1).astype(jnp.float32)
                    bsq = jnp.where(
                        jnp.arange(db.shape[0], dtype=jnp.int32) < counts[j],
                        bsq, jnp.float32(_BIG)).reshape(1, -1)
                    d0, i0, d1 = two_nn_fn(table[i], db, bsq)
                    nq = table.shape[1]
                    return d0.reshape(nq), i0.reshape(nq), d1.reshape(nq)
                return jax.vmap(one)(pi, pj)
        return run

    @jax.jit
    def run_base(table, counts, pi, pj):
        with jax.enable_x64(False):
            def one(i, j):
                return two_nn_pallas(table[i], table[j], counts[j])
            return jax.vmap(one)(pi, pj)

    variants = [
        ("base", run_base),
        ("oneblock_i8_128", batched(make_oneblock(128, True))),
        ("oneblock_i8_256", batched(make_oneblock(256, True))),
        ("oneblock_i8_512", batched(make_oneblock(512, True))),
        ("oneblock_i8_1024", batched(make_oneblock(1024, True))),
        ("bf16", batched(make_bf16_resident())),
        ("ABL_matmul_max", batched(make_ablation(128, "matmul_max"))),
        ("ABL_top1", batched(make_ablation(128, "top1"))),
    ]

    pi_np = np.array([i for i, _ in pairs], np.int32)
    pj_np = np.array([j for _, j in pairs], np.int32)
    orders = [np.arange(len(pairs))[::-1].copy(),
              np.roll(np.arange(len(pairs)), 1),
              np.roll(np.arange(len(pairs)), 2)]
    import jax.numpy as jnp

    ref_out = None
    flops = len(pairs) * 2.0 * K * K * 128
    for name, fn in variants:
        try:
            t0 = time.perf_counter()
            out = fn(table, counts, jnp.asarray(pi_np), jnp.asarray(pj_np))
            d0 = np.asarray(out[0])
            compile_s = time.perf_counter() - t0
            i0 = np.asarray(out[1])
            if ref_out is None:
                ref_out = (d0, i0)
                match = "ref"
            else:
                match = ("IDENTICAL" if (np.array_equal(ref_out[0], d0)
                                         and np.array_equal(ref_out[1], i0))
                         else "MISMATCH")
            best = 1e9
            for o in orders:
                pi = jnp.asarray(pi_np[o]); pj = jnp.asarray(pj_np[o])
                t0 = time.perf_counter()
                out = fn(table, counts, pi, pj)
                np.asarray(out[0][0, :8])
                best = min(best, time.perf_counter() - t0)
            print(f"{name:16s} pairs/s: {len(pairs)/best:7.0f}  "
                  f"tflops: {flops/best/1e12:6.2f}  "
                  f"mfu_int8: {flops/best/394e12*100:5.2f}%  "
                  f"compile: {compile_s:6.1f}s  vs_base: {match}",
                  flush=True)
        except Exception as e:
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
