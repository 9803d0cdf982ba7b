"""MXU descriptor matching — the TPU replacement for ANN kd-trees.

The reference matches SIFT keys with an approximate 2-NN kd-tree search per
query (`lib/ann_1.1_char`, `src/keys2a.cpp:347-377`: `annkPriSearch` k=2,
ratio test `d0 < ratio²·d1` on squared L2 distances, visit cap 200).  On TPU
the right shape is a brute-force blocked distance matmul:

    D = ‖a‖² + ‖b‖² − 2·A·Bᵀ

streamed through the MXU with a running top-2 reduction — exact (no visit
cap), and orders of magnitude more arithmetic throughput than the tree walk.
uint8 descriptors and their 128-term inner products are exactly representable
in f32, so distances are exact integers (parity with ANN's integer metric).

Public entry points:
  match_pair           — one image pair, host-friendly wrapper
  match_pairs_batched  — vmapped over a batch of pairs (the KeyMatchFull
                         replacement; shard the pair list across chips)
  prune_double_matches — keep-first dedup of many-to-one matches
                         (src/MatchTracks.cpp:394-452)
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.float32(3.0e38)


def _pallas_eligible(nq: int, nd: int, itemsize: int = 4) -> bool:
    """Trace-time gate for the fused Pallas 2-NN (matching_pallas.py):
    TPU backend + tile-aligned shapes.  The kernel streams db blocks from
    HBM when the table exceeds VMEM, so there is no db-size limit.

    ON by default on local TPU hardware (1.7x the XLA path on device).
    OFF by default through the axon remote-TPU tunnel: the remote service
    pays a ~60 s per-process executable LOAD for the Mosaic program even
    on a compile-cache hit (measured in the round-3 128-image race: the
    matching stage went 4.5 s -> 61.8 s per fresh process), which no
    steady-state speedup amortizes for one-shot pipeline runs.
    BUNDLER_PALLAS_MATCH=1 forces it on (bench.py does — its warmup pass
    absorbs the load); BUNDLER_NO_PALLAS_MATCH=1 disables everywhere."""
    if os.environ.get("BUNDLER_NO_PALLAS_MATCH"):
        return False
    if jax.default_backend() == "cpu":
        return False
    if ("axon" in (jax.config.jax_platforms or "")
            and not os.environ.get("BUNDLER_PALLAS_MATCH")):
        return False
    from .matching_pallas import BD, TQ
    return nq % TQ == 0 and nd % BD == 0


def _two_nn_best(query, db, db_count, block):
    """Fused Pallas kernel when eligible (≈1.9x the XLA path on TPU — the
    top-2 reduction stays in VMEM instead of round-tripping distance tiles
    through HBM), exact XLA fallback otherwise.  Both produce bit-identical
    integer distances."""
    if _pallas_eligible(query.shape[0], db.shape[0],
                        jnp.dtype(db.dtype).itemsize):
        from .matching_pallas import two_nn_pallas
        return two_nn_pallas(query, db, db_count)
    return two_nn(query, db, db_count, block=block)


def _prep_desc(x: np.ndarray) -> np.ndarray:
    """uint8 SIFT descriptors -> CENTERED int8 (u8 − 128): bit-identical
    squared distances (shift invariance) on the int8 MXU path at 2× bf16
    throughput and ¼ the memory/transfer cost.  Float inputs (tests,
    synthetic data) stay float32 on the bf16 path."""
    a = np.asarray(x)
    if np.issubdtype(a.dtype, np.integer):
        return (a.astype(np.int16) - 128).astype(np.int8)
    return a.astype(np.float32)


def _pad_to(x: np.ndarray, n: int, axis: int = 0) -> np.ndarray:
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _top2_merge(d0, i0, d1, i1, nd0, ni0, nd1, ni1):
    """Merge two (dist, idx) top-2 sets into one (selection network —
    cheaper on the VPU than a 4-way sort)."""
    # Best of the two firsts.
    a_first = d0 <= nd0
    m0 = jnp.where(a_first, d0, nd0)
    j0 = jnp.where(a_first, i0, ni0)
    # Second best: loser of the firsts vs winner's own second.
    loser = jnp.where(a_first, nd0, d0)
    own_second = jnp.where(a_first, d1, nd1)
    second_is_loser = loser <= own_second
    m1 = jnp.where(second_is_loser, loser, own_second)
    j1 = jnp.where(second_is_loser,
                   jnp.where(a_first, ni0, i0),
                   jnp.where(a_first, i1, ni1))
    return m0, j0, m1, j1


def _block_top2(d, start):
    """Exact top-2 minima of [nq, block] via two masked reductions —
    avoids lax.top_k's sort lowering on TPU."""
    nq, block = d.shape
    i0b = jnp.argmin(d, axis=1)
    d0b = jnp.min(d, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (nq, block), 1)
    d_masked = jnp.where(col == i0b[:, None], _BIG, d)
    i1b = jnp.argmin(d_masked, axis=1)
    d1b = jnp.min(d_masked, axis=1)
    return (d0b, (start + i0b).astype(jnp.int32),
            d1b, (start + i1b).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("block",))
def two_nn(query: jnp.ndarray, db: jnp.ndarray, db_count: jnp.ndarray,
           block: int = 2048):
    """Exact 2-NN of each query descriptor against a database.

    query: [Nq, 128] float32, or int8 CENTERED descriptors (u8 − 128 —
           squared L2 distances are shift-invariant, so centered int8
           operands give bit-identical integer distances while running the
           MXU's int8 path at 2× bf16 throughput and ¼ the HBM traffic)
    db:    [Nd, 128] same dtype as query, zero-padded beyond db_count
    Returns (d0, i0, d1): squared L2 distance and index of the nearest and
    the squared distance of the second-nearest (f32 exact integers).
    """
    nq, dim = query.shape
    nd = db.shape[0]
    int8_path = query.dtype == jnp.int8
    num_blocks = nd // block

    if int8_path:
        qi = query.astype(jnp.int32)
        q_sq = jnp.sum(qi * qi, axis=1).astype(jnp.float32)   # [Nq]
    else:
        q_sq = jnp.sum(query * query, axis=1)  # [Nq]
        # Descriptor values are ints <= 255, exactly representable in bf16,
        # and their 128-term dot products fit exactly in the f32 accumulator
        # — a single-pass bf16 MXU matmul yields EXACT integer distances.
        q_b = query.astype(jnp.bfloat16)

    def block_dists(blk, start):
        if int8_path:
            bi = blk.astype(jnp.int32)
            b_sq = jnp.sum(bi * bi, axis=1).astype(jnp.float32)
            dots = jax.lax.dot_general(
                query, blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)  # exact: |dot| <= 128·128² < 2^22
        else:
            b_sq = jnp.sum(blk * blk, axis=1)
            dots = jax.lax.dot_general(
                q_b, blk.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Nq, block]
        d = q_sq[:, None] + b_sq[None, :] - 2.0 * dots
        idx = start + jax.lax.broadcasted_iota(jnp.int32, (nq, block), 1)
        return jnp.where(idx < db_count, d, _BIG)

    if num_blocks == 1:
        # Fast path: one MXU matmul + two reduction passes, no scan.
        d = block_dists(db, jnp.int32(0))
        d0, i0, d1, _ = _block_top2(d, jnp.int32(0))
        return d0, i0, d1

    def body(carry, b):
        start = b * block
        blk = jax.lax.dynamic_slice_in_dim(db, start, block, axis=0)
        d = block_dists(blk, start)
        carry = _top2_merge(*carry, *_block_top2(d, start))
        return carry, None

    # Derive the carry from the (possibly device-varying) input so shard_map's
    # varying-axis tracking sees consistent types across the scan.
    big = jnp.zeros_like(query[:, 0], dtype=jnp.float32) + _BIG
    zid = jnp.zeros_like(query[:, 0], dtype=jnp.int32)
    init = (big, zid, big, zid)
    (d0, i0, d1, _), _ = jax.lax.scan(
        body, init, jnp.arange(num_blocks, dtype=jnp.int32))
    return d0, i0, d1


@functools.partial(jax.jit, static_argnames=())
def _ratio_accept(d0, d1, q_count, ratio_sq):
    nq = d0.shape[0]
    qidx = jnp.arange(nq, dtype=jnp.int32)
    valid = qidx < q_count
    # Reference test: dist[0] < ratio^2 * dist[1]  (src/keys2a.cpp:362).
    return valid & (d0 < ratio_sq * d1)


def match_pair(desc1: np.ndarray, desc2: np.ndarray, ratio: float = 0.6,
               block: int = 2048) -> np.ndarray:
    """Match image-1 keys against image-2 keys; returns int32 [m, 2] pairs
    (idx1, idx2), in idx1 order — same query direction as `MatchKeys`
    (`src/KeyMatchFull.cpp:127`: earlier image queries later image's tree)."""
    n1, n2 = len(desc1), len(desc2)
    if n1 == 0 or n2 == 0:
        return np.zeros((0, 2), dtype=np.int32)
    q = _pad_to(_prep_desc(desc1), _round_up(n1, 8))
    db = _pad_to(_prep_desc(desc2), _round_up(n2, block))
    d0, i0, d1 = two_nn(q, db, jnp.int32(n2), block=block)
    accept = _ratio_accept(d0, d1, jnp.int32(n1), jnp.float32(ratio * ratio))
    accept = np.asarray(accept)
    i0 = np.asarray(i0)
    idx1 = np.nonzero(accept)[0].astype(np.int32)
    return np.stack([idx1, i0[idx1].astype(np.int32)], axis=1)


@functools.partial(jax.jit, static_argnames=("block",))
def _match_batch_kernel(descA, descB, countA, countB, ratio_sq, block):
    """vmapped pair matcher: descA/B [P, K, 128] f32; counts [P]."""
    def one(a, b, ca, cb):
        d0, i0, d1 = _two_nn_best(a, b, cb, block)
        acc = _ratio_accept(d0, d1, ca, ratio_sq)
        return i0, acc
    return jax.vmap(one)(descA, descB, countA, countB)


@functools.partial(jax.jit, static_argnames=("block",))
def _match_pairs_from_table(table, counts, pi, pj, ratio_sq, block):
    """Pair matcher against an HBM-resident descriptor table.

    table: [N_img, K, 128] f32 (uploaded once — critical when the host link
    is slow); counts: [N_img]; pi/pj: [B] image indices per pair.  The
    per-pair descriptor blocks are gathered ON DEVICE.
    """
    def one(i, j):
        d0, i0, d1 = _two_nn_best(table[i], table[j], counts[j], block)
        acc = _ratio_accept(d0, d1, counts[i], ratio_sq)
        return i0, acc
    return jax.vmap(one)(pi, pj)


def _match_one_masked(qdesc, dbdesc, qcount, dbcount, ratio_sq, block):
    """One pair: 2-NN + ratio test + on-device keep-first dedup, returned as
    a MASKED nearest-neighbor row: out[q] = matched db index, or -1.

    Wire-optimal for slow host links: one int16 [K] row per pair (2 bytes
    per query instead of 4 per compacted match slot) and NO on-device
    argsort/compaction — the host recovers (idx1, idx2) with one nonzero
    scan, in ascending idx1 order exactly like the compact path."""
    d0, i0, d1 = _two_nn_best(qdesc, dbdesc, dbcount, block)
    acc = _ratio_accept(d0, d1, qcount, ratio_sq)
    nq = acc.shape[0]
    K = dbdesc.shape[0]
    qidx = jnp.arange(nq, dtype=jnp.int32)
    claimer = jax.ops.segment_min(jnp.where(acc, qidx, nq), i0,
                                  num_segments=K)
    keep = acc & (claimer[i0] == qidx)
    return jnp.where(keep, i0, -1).astype(jnp.int16)


@jax.jit
def _pack12(m):
    """Bit-pack masked int16 rows to 12 bits/entry: [B, K] -> [B, K/2, 3]
    uint8 (value = idx+1, 0 = no match).  25% fewer wire bytes than raw
    int16 on the serialized ~21 MB/s device->host fetch link that bounds
    matcher e2e (probe_fetch.py); exact for K <= 4094."""
    v = (m.astype(jnp.int32) + 1).astype(jnp.uint16)
    v0 = v[:, 0::2]
    v1 = v[:, 1::2]
    b0 = (v0 & 0xFF).astype(jnp.uint8)
    b1 = ((v0 >> 8) | ((v1 & 0xF) << 4)).astype(jnp.uint8)
    b2 = (v1 >> 4).astype(jnp.uint8)
    return jnp.stack([b0, b1, b2], axis=-1)


def _unpack12(p: np.ndarray, K: int) -> np.ndarray:
    """Host inverse of _pack12: uint8 [B, K/2, 3] -> int32 [B, K]."""
    b0 = p[..., 0].astype(np.uint16)
    b1 = p[..., 1].astype(np.uint16)
    b2 = p[..., 2].astype(np.uint16)
    out = np.empty((p.shape[0], K), np.int32)
    out[:, 0::2] = b0 | ((b1 & 0xF) << 8)
    out[:, 1::2] = (b1 >> 4) | (b2 << 4)
    return out - 1


@functools.partial(jax.jit, static_argnames=("block",))
def _match_pairs_from_table_masked(table, counts, pi, pj, ratio_sq, block):
    """Batched masked-row matcher against an HBM-resident table (the
    transfer-lean sibling of `_match_pairs_from_table_compact`)."""
    def one(i, j):
        return _match_one_masked(table[i], table[j], counts[i], counts[j],
                                 ratio_sq, block)
    return jax.vmap(one)(pi, pj)


@functools.partial(jax.jit, static_argnames=("block", "mesh"))
def _match_pairs_from_table_masked_sharded(table, counts, pi, pj, ratio_sq,
                                           block, mesh):
    """Pair batch sharded over the mesh, table replicated (masked-row
    output)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    axis = mesh.axis_names[0]

    def local(t, c, a, b):
        return _match_pairs_from_table_masked(t, c, a, b, ratio_sq, block)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(axis), P(axis)),
                   out_specs=P(axis))
    return fn(table, counts, pi, pj)


def _match_one_compact(qdesc, dbdesc, qcount, dbcount, ratio_sq, block,
                       max_out, out_dtype=jnp.int32):
    """One pair: 2-NN + ratio test + on-device keep-first dedup
    (PruneDoubleMatches, src/MatchTracks.cpp:394-452: first match claiming
    each target key wins) + compaction to fixed-size [max_out, 2] + count."""
    K = dbdesc.shape[0]
    d0, i0, d1 = _two_nn_best(qdesc, dbdesc, dbcount, block)
    acc = _ratio_accept(d0, d1, qcount, ratio_sq)
    nq = acc.shape[0]
    qidx = jnp.arange(nq, dtype=jnp.int32)
    # On-device keep-first dedup: the lowest query index claiming each
    # target key wins (matches the host prune's scan order).
    claimer = jax.ops.segment_min(jnp.where(acc, qidx, nq), i0,
                                  num_segments=K)
    keep = acc & (claimer[i0] == qidx)
    # Stable partition: kept query indices first, in ascending order.
    order = jnp.argsort(~keep, stable=True)
    sel = order[:max_out].astype(jnp.int32)
    cnt = jnp.sum(keep)
    valid_slots = jnp.arange(max_out) < cnt
    idx1 = jnp.where(valid_slots, sel, -1)
    idx2 = jnp.where(valid_slots, i0[sel], -1)
    out = jnp.stack([idx1, idx2], axis=1).astype(out_dtype)
    return out, jnp.minimum(cnt, max_out).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("block", "max_out", "out_dtype"))
def _match_pairs_from_table_compact(table, counts, pi, pj, ratio_sq,
                                    block, max_out, out_dtype=jnp.int32):
    """Batched _match_one_compact against an HBM-resident table — tiny host
    transfers, no host nonzero/unique scans (matters on slow host links).
    out_dtype=int16 halves the transfer when the key count fits."""
    def one(i, j):
        return _match_one_compact(table[i], table[j], counts[i], counts[j],
                                  ratio_sq, block, max_out, out_dtype)
    return jax.vmap(one)(pi, pj)


@functools.partial(jax.jit, static_argnames=("block", "max_out",
                                              "out_dtype", "mesh"))
def _match_pairs_from_table_compact_sharded(table, counts, pi, pj, ratio_sq,
                                            block, max_out, out_dtype, mesh):
    """Pair batch sharded over the mesh, table replicated — each device runs
    the compact matcher on its slice of the pair list (the KeyMatchFull
    loop data-parallel over pairs, SURVEY.md §2.4 match-graph-sharding row)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    axis = mesh.axis_names[0]

    def local(t, c, a, b):
        return _match_pairs_from_table_compact(t, c, a, b, ratio_sq,
                                               block, max_out, out_dtype)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(axis), P(axis)),
                   out_specs=(P(axis), P(axis)))
    return fn(table, counts, pi, pj)


class DescriptorTable:
    """Device-resident padded descriptor store for repeated pair matching.

    With `mesh` set (>1 device), match_pairs shards each pair batch across
    the mesh (table replicated on every device)."""

    def __init__(self, descs: Sequence[np.ndarray], block: int = 2048,
                 mesh=None):
        self.mesh = mesh if (mesh is not None
                             and mesh.devices.size > 1) else None
        # Shrink the tile to the actual key budget: padding 1k-key images to
        # a 2k block wastes 4x the MXU FLOPs of the distance matmuls.
        maxk = max((len(d) for d in descs), default=1) or 1
        self.block = min(block, _round_up(maxk, 512))
        block = self.block
        kmax = _round_up(maxk, block)
        # Bucket the image count so different collections reuse the same
        # compiled kernel (remote compiles cost minutes).
        n = _round_up(len(descs), 8)
        # uint8 collections live as centered int8 (¼ the HBM + upload cost,
        # int8 MXU path); float collections as f32 (bf16 path).
        int_in = all(np.issubdtype(np.asarray(d).dtype, np.integer)
                     for d in descs) if descs else True
        dtype = np.int8 if int_in else np.float32
        table = np.zeros((n, kmax, 128), dtype=dtype)
        counts = np.zeros(n, dtype=np.int32)
        for i, d in enumerate(descs):
            table[i, :len(d)] = _prep_desc(d)
            counts[i] = len(d)
        self.table = jax.device_put(table)
        self.counts = jax.device_put(counts)

    def match_pairs(self, pairs: Sequence[Tuple[int, int]],
                    ratio: float = 0.6, batch: Optional[int] = None,
                    min_matches: int = 0,
                    max_out: int = 2048) -> "Dict[Tuple[int,int], np.ndarray]":
        # batch = pairs per dispatch.  On the XLA fallback each lane peaks
        # at one [block, block] f32 distance tile (16 MB at block=2048), so
        # 256 lanes bound HBM; the fused Pallas kernel never materializes
        # the tile, so it takes 4x the lanes per dispatch — dispatch
        # latency (~50-80 ms on the tunnel) amortizes over the batch.
        K = self.table.shape[1]
        if batch is None:
            batch = 1024 if _pallas_eligible(
                K, K, jnp.dtype(self.table.dtype).itemsize) else 256
        out: Dict[Tuple[int, int], np.ndarray] = {}
        # Masked-row wire format when indices fit int16: one [K] row per
        # pair (2 bytes/query, no device argsort, no match cap) — half the
        # transfer of the compacted [max_out, 2] format.  Falls back to the
        # compact int32 format for huge key counts.
        masked = K <= 32767
        # 12-bit wire packing on top of the masked rows (3 bytes per 2
        # queries instead of 4) — the fetch link, not the kernel, bounds
        # matcher e2e through the tunnel.
        packed = masked and K % 2 == 0 and K <= 4094
        if not masked:
            max_out = min(max_out, K)
        if self.mesh is not None:
            # Pad the batch to a multiple of the mesh size for even shards.
            D = self.mesh.devices.size
            batch = _round_up(batch, D)
        results = []
        for start in range(0, len(pairs), batch):
            chunk = list(pairs[start:start + batch])
            n_real = len(chunk)
            while len(chunk) < batch:
                chunk.append(chunk[0])
            pi = jnp.asarray(np.array([i for i, _ in chunk], np.int32))
            pj = jnp.asarray(np.array([j for _, j in chunk], np.int32))
            if masked:
                if self.mesh is not None:
                    m = _match_pairs_from_table_masked_sharded(
                        self.table, self.counts, pi, pj,
                        jnp.float32(ratio * ratio), self.block, self.mesh)
                else:
                    m = _match_pairs_from_table_masked(
                        self.table, self.counts, pi, pj,
                        jnp.float32(ratio * ratio), self.block)
                if packed:
                    m = _pack12(m)
                results.append((chunk[:n_real], m, None))
            elif self.mesh is not None:
                m, cnt = _match_pairs_from_table_compact_sharded(
                    self.table, self.counts, pi, pj,
                    jnp.float32(ratio * ratio), self.block, max_out,
                    jnp.int32, self.mesh)
                results.append((chunk[:n_real], m, cnt))
            else:
                m, cnt = _match_pairs_from_table_compact(
                    self.table, self.counts, pi, pj,
                    jnp.float32(ratio * ratio), self.block, max_out,
                    jnp.int32)
                results.append((chunk[:n_real], m, cnt))
        # Fetch after all batches are enqueued (overlaps device + transfer).
        # Multi-chunk runs are concatenated ON DEVICE and fetched as one
        # array: every separate device->host array pays ~10-25 ms of link
        # overhead on top of its bytes (probe_fetch.py), which added ~0.5 s
        # to the 32-chunk 256-image matching leg.
        if len(results) > 1:
            big = np.asarray(jnp.concatenate([m for _, m, _ in results]))
            offs_m = np.cumsum([0] + [m.shape[0] for _, m, _ in results])
            cnts = [c for _, _, c in results]
            big_cnt = (np.asarray(jnp.concatenate(cnts))
                       if cnts[0] is not None else None)
            results = [(chunk,
                        big[offs_m[k]:offs_m[k + 1]],
                        None if big_cnt is None
                        else big_cnt[offs_m[k]:offs_m[k + 1]])
                       for k, (chunk, _, _) in enumerate(results)]
        for chunk, m, cnt in results:
            m = np.asarray(m)
            if cnt is None:
                if packed:
                    m = _unpack12(m, K)
                # ONE vectorized nonzero over the whole batch (a per-pair
                # Python loop of nonzeros costs ~0.1 ms × B on the host).
                rows, cols = np.nonzero(m >= 0)
                vals = m[rows, cols].astype(np.int32)
                counts = np.bincount(rows, minlength=len(m))
                offs = np.concatenate([[0], np.cumsum(counts)])
                cols = cols.astype(np.int32)
                for p, (i, j) in enumerate(chunk):
                    a, b = offs[p], offs[p + 1]
                    if b - a >= min_matches:
                        out[(i, j)] = np.stack([cols[a:b], vals[a:b]],
                                               axis=1)
                continue
            cnt = np.asarray(cnt)
            for p, (i, j) in enumerate(chunk):
                mm = m[p, :cnt[p]].astype(np.int32)  # already deduped on device
                if len(mm) >= min_matches:
                    out[(i, j)] = mm
        return out


def match_pairs_batched(
    descs: Sequence[np.ndarray],
    pairs: Sequence[Tuple[int, int]],
    ratio: float = 0.6,
    batch: int = 32,
    block: int = 1024,
    min_matches: int = 0,
) -> Dict[Tuple[int, int], np.ndarray]:
    """Match many image pairs with one padded vmapped kernel.

    descs: per-image uint8 [k_i, 128] arrays. pairs: (i, j) with i < j —
    image i queries image j (KeyMatchFull direction: `src/KeyMatchFull.cpp`
    matches j<i querying into tree_i, emitting pairs (j, i)).
    Applies keep-first dedup (PruneDoubleMatches) and the >= min_matches pair
    cutoff (`src/KeyMatchFull.cpp:131` uses 16).
    """
    if not pairs:
        return {}
    kmax = _round_up(max(max(len(descs[i]), len(descs[j])) for i, j in pairs), block)
    out: Dict[Tuple[int, int], np.ndarray] = {}
    padded = {}

    def get_padded(i):
        if i not in padded:
            padded[i] = _pad_to(_prep_desc(descs[i]), kmax)
        return padded[i]

    for start in range(0, len(pairs), batch):
        chunk = pairs[start:start + batch]
        A = np.stack([get_padded(i) for i, _ in chunk])
        B = np.stack([get_padded(j) for _, j in chunk])
        ca = np.array([len(descs[i]) for i, _ in chunk], dtype=np.int32)
        cb = np.array([len(descs[j]) for _, j in chunk], dtype=np.int32)
        # Pad the batch dimension so one compilation serves every chunk size.
        if len(chunk) < batch:
            A = _pad_to(A, batch)
            B = _pad_to(B, batch)
            ca = _pad_to(ca, batch)
            cb = _pad_to(cb, batch)
        i0, acc = _match_batch_kernel(
            jnp.asarray(A), jnp.asarray(B), jnp.asarray(ca), jnp.asarray(cb),
            jnp.float32(ratio * ratio), block)
        i0 = np.asarray(i0)
        acc = np.asarray(acc)
        for p, (i, j) in enumerate(chunk):
            idx1 = np.nonzero(acc[p])[0].astype(np.int32)
            m = np.stack([idx1, i0[p, idx1].astype(np.int32)], axis=1)
            m = prune_double_matches(m)
            if len(m) >= min_matches:
                out[(i, j)] = m
    return out


def prune_double_matches(matches: np.ndarray) -> np.ndarray:
    """Keep the first match claiming each target key; drop later repeats.

    Mirrors `PruneDoubleMatches` (`src/MatchTracks.cpp:394-452`) which scans
    the list in order and erases matches whose m_idx2 was already seen.
    """
    if len(matches) == 0:
        return matches
    idx2 = matches[:, 1]
    # np.unique returns the first occurrence index for each unique value.
    _, first = np.unique(idx2, return_index=True)
    keep = np.zeros(len(matches), dtype=bool)
    keep[first] = True
    return matches[keep]


def symmetrize(matches: Dict[Tuple[int, int], np.ndarray]
               ) -> Dict[Tuple[int, int], np.ndarray]:
    """Add the reversed list for every (i, j), as `MakeMatchListsSymmetric`
    (`src/MatchTracks.cpp:337-392`) does before track building."""
    out = dict(matches)
    for (i, j), m in matches.items():
        out[(j, i)] = m[:, ::-1].copy()
    return out
