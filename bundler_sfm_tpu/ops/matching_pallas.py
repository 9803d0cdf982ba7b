"""Fused Pallas 2-NN kernel — distance matmul + top-2 in one VMEM pass.

The XLA path (`ops.matching.two_nn`) materializes the [Nq, block] distance
tile in HBM between the matmul and the reduction; this Pallas kernel keeps
the tile in VMEM: per (query tile, db block) grid step the MXU computes a
[TQ, BD] distance tile and the running top-2 folds into the (revisited)
output block — the memory-bound reduction rides on the matmul's operands.

The db streams through the grid's inner dimension (Pallas double-buffers
the HBM→VMEM block DMA automatically), so the database is NOT required to
fit VMEM — any Nd works, unlike the round-2 kernel that held the whole db
resident (SURVEY.md §2 ann_1.1_char row: the reference bounds work with
`annMaxPtsVisit`; we bound memory, never results — exact 2-NN).

Epilogue shape (the round-4 MFU rework): the kernel tracks the top-2 of
the MAX-form score m = dots − b_sq/2 (argmax of m ≡ argmin of squared
distance, since d = q_sq + b_sq − 2·dots = q_sq − 2m with q_sq constant
per query row).  b_sq arrives PRECOMPUTED with padding rows poisoned to
+_BIG, which deletes the per-element distance assembly AND the validity
masking from the inner loop — the per-element VPU work drops from ~11
elementwise passes to ~5, and the VPU epilogue is what bounds this kernel
(the int8 MXU matmul is ~3 µs/pair; the epilogue tens of µs).  d0/d1 are
reconstructed as q_sq − 2m once per query at the end.  All quantities are
half-integers below 2²³ for uint8 descriptors, so results stay
BIT-IDENTICAL to the XLA path (including tie-breaking: ties resolve to
the lowest index in both).

MEASURED CEILING (round-5 ablations, probe_pallas_variants.py at 2208
pairs × 2048² int8 keys on one v5e): full exact top-2 35.0 TFLOP/s
(8.9% int8 MFU); dropping the second max 38.5; matmul + a SINGLE max
reduction (no valid outputs) 47.4 TFLOP/s = 12.0%.  Any epilogue that
materializes the [TQ, Nd] f32 score tile is bounded by that 12% — the
VPU streaming of the tile, not the top-2 logic, is the wall — so the
exact kernel sits within 26% of its structural ceiling.  Going past 12%
needs score-tile reduction fused into the MXU accumulation, which
Pallas/Mosaic cannot express today; the ANN-vs-MXU win over the
reference (~10³×) does not hinge on it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38
TQ = 256      # query tile (grid dim 0)
BD = 512      # db block per grid step (grid dim 1, streamed from HBM)

# db bytes under which the whole table is held resident in VMEM and the
# kernel loops blocks with a fori (measured faster than the streamed grid:
# 7.5k vs 5.7k pairs/s at 2048x2048 int8 — no per-step block DMA turnover);
# above it the db streams through grid dim 1 with double-buffered DMA.
_RESIDENT_DB_BYTES = 8 * 1024 * 1024

# One-shot epilogue eligibility: the whole [TQ_OB, Nd] f32 score tile is
# materialized at once (no fori merges).  Round-4 probe at 2208 pairs/
# dispatch (probe_pallas_variants.py): 33.2 TFLOP/s int8-equivalent vs the
# fori-resident kernel's 23.1 — the per-block merge chain was ~30% of the
# kernel.  TQ_OB=128 measured fastest of {128, 256, 512, 1024}; outputs
# bit-identical.  Nd cap keeps the score tile ≤ 8 MB VMEM.
TQ_OB = 128
_ONEBLOCK_MAX_ND = 16384


def _query_sq(q):
    if q.dtype == jnp.int8:
        qi = q.astype(jnp.int32)
        return jnp.sum(qi * qi, axis=1, keepdims=True).astype(jnp.float32)
    return jnp.sum(q * q, axis=1, keepdims=True)


def _block_scores(q, blk, bsq_blk):
    """Max-form scores m = dots − b_sq/2 for one [TQ, BD] tile."""
    if q.dtype == jnp.int8:
        dots = jax.lax.dot_general(
            q, blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
    else:
        dots = jax.lax.dot_general(
            q.astype(jnp.bfloat16), blk.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return dots - 0.5 * bsq_blk[None, :]


def _tile_top2(m, col):
    """Exact top-2 maxima of [TQ, BD] + first-max column (local ids)."""
    m0 = jnp.max(m, axis=1)                             # [TQ]
    i0 = jnp.min(jnp.where(m == m0[:, None], col, jnp.int32(2 ** 30)),
                 axis=1)
    m1 = jnp.max(jnp.where(col == i0[:, None], jnp.float32(-_BIG), m),
                 axis=1)
    return m0, i0, m1


def _merge_top2(r0, ri, r1, m0, i0, m1):
    """Fold a new block's top-2 into the running top-2 (max-form; ties keep
    the earlier/running entry — the lowest db index, as the XLA merge)."""
    a_first = r0 >= m0
    w0 = jnp.where(a_first, r0, m0)
    wi = jnp.where(a_first, ri, i0)
    loser = jnp.where(a_first, m0, r0)
    own2 = jnp.where(a_first, r1, m1)
    return w0, wi, jnp.maximum(loser, own2)


def _two_nn_kernel(q_ref, db_ref, bsq_ref, d0_ref, i0_ref, d1_ref):
    row = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        d0_ref[row, :] = jnp.full((TQ,), -_BIG, jnp.float32)
        i0_ref[row, :] = jnp.zeros((TQ,), jnp.int32)
        d1_ref[row, :] = jnp.full((TQ,), -_BIG, jnp.float32)

    q = q_ref[:]                                       # [TQ, 128]
    start = j * BD
    m = _block_scores(q, db_ref[:], bsq_ref[0, :])     # [TQ, BD]
    col = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    m0, i0l, m1 = _tile_top2(m, col)
    r0, ri, r1 = _merge_top2(d0_ref[row, :], i0_ref[row, :], d1_ref[row, :],
                             m0, start + i0l, m1)
    last = pl.num_programs(1) - 1
    # Outputs hold the running MAX-form top-2 between steps; the last step
    # converts to squared distances d = q_sq − 2m (exact: half-integers).
    qsq = _query_sq(q)[:, 0]
    d0_ref[row, :] = jnp.where(j == last, qsq - 2.0 * r0, r0)
    i0_ref[row, :] = ri
    d1_ref[row, :] = jnp.where(j == last, qsq - 2.0 * r1, r1)


def _two_nn_kernel_oneblock(q_ref, db_ref, bsq_ref, d0_ref, i0_ref, d1_ref):
    """Whole-db, single-score-tile variant: one [TQ_OB, Nd] max-form tile
    per grid step, top-2 in one `_tile_top2` pass — no fori merge chain.
    Fastest resident path when the score tile fits VMEM (see TQ_OB note)."""
    q = q_ref[:]                                       # [TQ_OB, 128]
    dots = jax.lax.dot_general(
        q, db_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) \
        if q.dtype == jnp.int8 else jax.lax.dot_general(
            q.astype(jnp.bfloat16), db_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    m = dots - 0.5 * bsq_ref[0, :][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    m0, i0l, m1 = _tile_top2(m, col)
    row = pl.program_id(0)
    qsq = _query_sq(q)[:, 0]
    d0_ref[row, :] = qsq - 2.0 * m0
    i0_ref[row, :] = i0l
    d1_ref[row, :] = qsq - 2.0 * m1


def _two_nn_kernel_resident(q_ref, db_ref, bsq_ref, d0_ref, i0_ref, d1_ref):
    """Whole-db-in-VMEM variant: grid over query tiles, fori over BD
    blocks of the resident table — no block DMA turnover between steps
    (measured 7.5k vs 5.7k pairs/s for the streamed grid at 2048x2048
    int8).  A pair-per-grid-step rewrite (fori over query tiles AND
    blocks) was abandoned: the doubly-nested vmapped Mosaic program took
    >25 min to compile on the remote backend."""
    q = q_ref[:]                                       # [TQ, 128]
    num_blocks = db_ref.shape[0] // BD
    col = jax.lax.broadcasted_iota(jnp.int32, (TQ, BD), 1)

    def body(b, carry):
        start = b * BD
        m = _block_scores(q, db_ref[pl.ds(start, BD), :],
                          bsq_ref[0, pl.ds(start, BD)])
        m0, i0l, m1 = _tile_top2(m, col)
        return _merge_top2(*carry, m0, start + i0l, m1)

    init = (jnp.full((TQ,), -_BIG, jnp.float32),
            jnp.zeros((TQ,), jnp.int32),
            jnp.full((TQ,), -_BIG, jnp.float32))
    # int32 bounds: under jax_enable_x64 python-int bounds make the loop
    # counter int64, which Mosaic cannot lower.
    r0, ri, r1 = jax.lax.fori_loop(jnp.int32(0), jnp.int32(num_blocks),
                                   body, init)
    row = pl.program_id(0)
    qsq = _query_sq(q)[:, 0]
    d0_ref[row, :] = qsq - 2.0 * r0
    i0_ref[row, :] = ri
    d1_ref[row, :] = qsq - 2.0 * r1


@functools.partial(jax.jit, static_argnames=("interpret",))
def two_nn_pallas(query: jnp.ndarray, db: jnp.ndarray, db_count: jnp.ndarray,
                  interpret: bool = False):
    """Fused 2-NN: query [Nq, 128] f32 or centered int8 (Nq % TQ == 0),
    db [Nd, 128] same dtype (Nd % BD == 0).  Small dbs run VMEM-resident;
    large dbs stream from HBM through the grid.  Returns (d0, i0, d1)
    like `ops.matching.two_nn`."""
    nq = query.shape[0]
    nd = db.shape[0]
    resident = nd * 128 * jnp.dtype(db.dtype).itemsize <= _RESIDENT_DB_BYTES
    # The package enables jax_enable_x64; Mosaic has no 64-bit types, and
    # x64 tracing leaks i64 into index maps.  This kernel is all-f32/i32, so
    # trace it with x64 off.
    with jax.enable_x64(False):
        # Precomputed db norms with padding poisoned: rows >= db_count get
        # b_sq = +_BIG, so their max-form score is ~-_BIG/2 and they can
        # never enter the top-2 — no per-element validity masking in the
        # kernel.  (d1 for a padded runner-up reconstructs to ~q_sq + _BIG
        # ≈ _BIG, matching the XLA path's masked-distance value.)
        if db.dtype == jnp.int8:
            bi = db.astype(jnp.int32)
            b_sq = jnp.sum(bi * bi, axis=1).astype(jnp.float32)
        else:
            b_sq = jnp.sum(db * db, axis=1).astype(jnp.float32)
        b_sq = jnp.where(
            jnp.arange(nd, dtype=jnp.int32)
            < jnp.asarray(db_count, jnp.int32),
            b_sq, jnp.float32(_BIG)).reshape(1, nd)
        # Oneblock eligibility is a total-VMEM-footprint gate, not just a
        # db-bytes gate: an f32 db at the resident cap (8 MB) plus the
        # single [TQ_OB, Nd] f32 score tile (8 MB at Nd=16384) plus b_sq,
        # the query tile and the three resident outputs can exceed 16 MB
        # parts — a shape the fori-resident kernel (score tiles ~0.5 MB)
        # compiles fine.
        ob_bytes = (nd * 128 * jnp.dtype(db.dtype).itemsize  # db
                    + 4 * TQ_OB * nd                         # score tile
                    + 4 * nd                                 # b_sq
                    + TQ_OB * 128 * jnp.dtype(db.dtype).itemsize
                    + 3 * 4 * nq)                            # outputs
        if (resident and nd <= _ONEBLOCK_MAX_ND and nq % TQ_OB == 0
                and ob_bytes <= 12 * 1024 * 1024):
            d0, i0, d1 = _call_resident(query, db, b_sq, (nq // TQ_OB,),
                                        db.shape, nq, interpret,
                                        kernel=_two_nn_kernel_oneblock,
                                        tq=TQ_OB)
        elif resident:
            d0, i0, d1 = _call_resident(query, db, b_sq, (nq // TQ,),
                                        db.shape, nq, interpret)
        else:
            d0, i0, d1 = _call(query, db, b_sq, (nq // TQ, nd // BD),
                               nq, interpret)
    return d0.reshape(nq), i0.reshape(nq), d1.reshape(nq)


def _call_resident(query, db, b_sq, grid, db_shape, nq, interpret,
                   kernel=_two_nn_kernel_resident, tq=TQ):
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(db_shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq // tq, tq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq // tq, tq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq // tq, tq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq // tq, tq), jnp.float32),
            jax.ShapeDtypeStruct((nq // tq, tq), jnp.int32),
            jax.ShapeDtypeStruct((nq // tq, tq), jnp.float32),
        ),
        interpret=interpret,
    )(query, db, b_sq)


def _call(query, db, b_sq, grid, nq, interpret):
    return pl.pallas_call(
        _two_nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BD, 128), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BD), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq // TQ, TQ), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq // TQ, TQ), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq // TQ, TQ), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq // TQ, TQ), jnp.float32),
            jax.ShapeDtypeStruct((nq // TQ, TQ), jnp.int32),
            jax.ShapeDtypeStruct((nq // TQ, TQ), jnp.float32),
        ),
        interpret=interpret,
    )(query, db, b_sq)
