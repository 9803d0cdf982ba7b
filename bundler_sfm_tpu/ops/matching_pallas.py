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

Distances are exact integers < 128·255² ≈ 2^23, representable in f32.
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


def _min_and_arg(d, base_idx):
    """Min + its index over axis 1 of [TQ, BD] without argmin lowering."""
    dmin = jnp.min(d, axis=1, keepdims=True)           # [TQ, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + base_idx
    idx = jnp.min(jnp.where(d <= dmin, col, jnp.int32(2 ** 30)), axis=1)
    return dmin[:, 0], idx


def _two_nn_kernel(q_ref, db_ref, nd_ref, d0_ref, i0_ref, d1_ref):
    row = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        d0_ref[row, :] = jnp.full((TQ,), _BIG, jnp.float32)
        i0_ref[row, :] = jnp.zeros((TQ,), jnp.int32)
        d1_ref[row, :] = jnp.full((TQ,), _BIG, jnp.float32)

    q = q_ref[:]                                       # [TQ, 128]
    int8_path = q.dtype == jnp.int8
    if int8_path:
        qi = q.astype(jnp.int32)
        q_sq = jnp.sum(qi * qi, axis=1,
                       keepdims=True).astype(jnp.float32)
    else:
        q_sq = jnp.sum(q * q, axis=1, keepdims=True)   # [TQ, 1]
    nd_valid = nd_ref[0, 0]
    start = j * BD
    blk = db_ref[:]                                    # [BD, 128]
    if int8_path:
        # Centered int8 operands (u8 − 128; distances shift-invariant):
        # the MXU int8 path at 2× bf16 rate, exact i32 accumulation.
        bi = blk.astype(jnp.int32)
        b_sq = jnp.sum(bi * bi, axis=1).astype(jnp.float32)
        dots = jax.lax.dot_general(
            q, blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
    else:
        b_sq = jnp.sum(blk * blk, axis=1)              # [BD]
        # bf16 operands are EXACT for uint8 descriptor values and run
        # one MXU pass instead of f32's three; accumulation stays f32.
        dots = jax.lax.dot_general(
            q.astype(jnp.bfloat16), blk.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    d = q_sq + b_sq[None, :] - 2.0 * dots              # [TQ, BD]
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + start
    d = jnp.where(col < nd_valid, d, jnp.float32(_BIG))
    nd0, ni0 = _min_and_arg(d, start)
    d_masked = jnp.where(col == ni0[:, None], jnp.float32(_BIG), d)
    nd1, _ = _min_and_arg(d_masked, start)
    # Merge running top-2 (in the revisited output rows) with block top-2.
    d0, i0, d1 = d0_ref[row, :], i0_ref[row, :], d1_ref[row, :]
    a_first = d0 <= nd0
    m0 = jnp.where(a_first, d0, nd0)
    j0 = jnp.where(a_first, i0, ni0)
    loser = jnp.where(a_first, nd0, d0)
    own2 = jnp.where(a_first, d1, nd1)
    d0_ref[row, :] = m0
    i0_ref[row, :] = j0
    d1_ref[row, :] = jnp.minimum(loser, own2)


def _two_nn_kernel_resident(q_ref, db_ref, nd_ref, d0_ref, i0_ref, d1_ref):
    """Whole-db-in-VMEM variant: grid over query tiles, fori over BD
    blocks of the resident table — no block DMA turnover between steps
    (measured 7.5k vs 5.7k pairs/s for the streamed grid at 2048x2048
    int8).  A pair-per-grid-step rewrite (fori over query tiles AND
    blocks) was abandoned: the doubly-nested vmapped Mosaic program took
    >25 min to compile on the remote backend."""
    q = q_ref[:]                                       # [TQ, 128]
    int8_path = q.dtype == jnp.int8
    if int8_path:
        qi = q.astype(jnp.int32)
        q_sq = jnp.sum(qi * qi, axis=1,
                       keepdims=True).astype(jnp.float32)
    else:
        q_sq = jnp.sum(q * q, axis=1, keepdims=True)   # [TQ, 1]
    nd_valid = nd_ref[0, 0]
    num_blocks = db_ref.shape[0] // BD

    def body(b, carry):
        d0, i0, d1 = carry
        start = b * BD
        blk = db_ref[pl.ds(start, BD), :]              # [BD, 128]
        if int8_path:
            bi = blk.astype(jnp.int32)
            b_sq = jnp.sum(bi * bi, axis=1).astype(jnp.float32)
            dots = jax.lax.dot_general(
                q, blk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            b_sq = jnp.sum(blk * blk, axis=1)          # [BD]
            dots = jax.lax.dot_general(
                q.astype(jnp.bfloat16), blk.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        d = q_sq + b_sq[None, :] - 2.0 * dots          # [TQ, BD]
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + start
        d = jnp.where(col < nd_valid, d, jnp.float32(_BIG))
        nd0, ni0 = _min_and_arg(d, start)
        d_masked = jnp.where(col == ni0[:, None], jnp.float32(_BIG), d)
        nd1, _ = _min_and_arg(d_masked, start)
        a_first = d0 <= nd0
        m0 = jnp.where(a_first, d0, nd0)
        j0 = jnp.where(a_first, i0, ni0)
        loser = jnp.where(a_first, nd0, d0)
        own2 = jnp.where(a_first, d1, nd1)
        return m0, j0, jnp.minimum(loser, own2)

    init = (jnp.full((TQ,), _BIG, jnp.float32),
            jnp.zeros((TQ,), jnp.int32),
            jnp.full((TQ,), _BIG, jnp.float32))
    # int32 bounds: under jax_enable_x64 python-int bounds make the loop
    # counter int64, which Mosaic cannot lower.
    d0, i0, d1 = jax.lax.fori_loop(jnp.int32(0), jnp.int32(num_blocks),
                                   body, init)
    row = pl.program_id(0)
    d0_ref[row, :] = d0
    i0_ref[row, :] = i0
    d1_ref[row, :] = d1


@functools.partial(jax.jit, static_argnames=("interpret",))
def two_nn_pallas(query: jnp.ndarray, db: jnp.ndarray, db_count: jnp.ndarray,
                  interpret: bool = False):
    """Fused 2-NN: query [Nq, 128] f32 or centered int8 (Nq % TQ == 0),
    db [Nd, 128] same dtype (Nd % BD == 0).  Small dbs run VMEM-resident;
    large dbs stream from HBM through the grid.  Returns (d0, i0, d1)
    like `ops.matching.two_nn`."""
    nq = query.shape[0]
    nd = db.shape[0]
    nd_arr = jnp.asarray(db_count, jnp.int32).reshape(1, 1)
    resident = nd * 128 * jnp.dtype(db.dtype).itemsize <= _RESIDENT_DB_BYTES
    # The package enables jax_enable_x64; Mosaic has no 64-bit types, and
    # x64 tracing leaks i64 into index maps.  This kernel is all-f32/i32, so
    # trace it with x64 off.
    with jax.enable_x64(False):
        if resident:
            d0, i0, d1 = _call_resident(query, db, nd_arr, (nq // TQ,),
                                        db.shape, nq, interpret)
        else:
            d0, i0, d1 = _call(query, db, nd_arr, (nq // TQ, nd // BD),
                               nq, interpret)
    return d0.reshape(nq), i0.reshape(nq), d1.reshape(nq)


def _call_resident(query, db, nd_arr, grid, db_shape, nq, interpret):
    return pl.pallas_call(
        _two_nn_kernel_resident,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(db_shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq // TQ, TQ), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq // TQ, TQ), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq // TQ, TQ), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq // TQ, TQ), jnp.float32),
            jax.ShapeDtypeStruct((nq // TQ, TQ), jnp.int32),
            jax.ShapeDtypeStruct((nq // TQ, TQ), jnp.float32),
        ),
        interpret=interpret,
    )(query, db, nd_arr)


def _call(query, db, nd_arr, grid, nq, interpret):
    return pl.pallas_call(
        _two_nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BD, 128), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
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
    )(query, db, nd_arr)
