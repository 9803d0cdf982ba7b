"""Match-graph sharding — the pair list distributed over the device mesh.

The TPU replacement for `KeyMatchFull`'s O(N²) sequential pair loop
(`src/KeyMatchFull.cpp:105-151`) at scale: the batch of (queryA, queryB)
descriptor blocks is sharded over the mesh's data axis; every chip runs the
MXU 2-NN matcher on its shard (embarrassingly parallel — bandwidth-heavy
DCN-friendly work, SURVEY.md §2.4).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from bundler_sfm_tpu.ops.matching import (
    _match_batch_kernel, _match_one_compact, _pad_to, _prep_desc,
    _round_up, prune_double_matches,
)

AXIS = "shard"


@functools.partial(jax.jit, static_argnames=("mesh", "block", "max_out",
                                              "out_dtype", "num_rots"))
def _ring_match_all_pairs(table, counts, ratio_sq, mesh: Mesh, block: int,
                          max_out: int, out_dtype, num_rots: int,
                          lane_want=None):
    """All-pairs matching over a DEVICE-RESIDENT image-sharded descriptor
    table with a ppermute ring (SURVEY.md §5's multi-host all-pairs
    prescription — the ring-attention communication pattern applied to
    distance matrices).

    table: [D, I, K, 128] (images sharded over the mesh axis), counts
    [D, I].  Each device keeps its QUERY shard pinned and rotates a DB shard
    around the ring; at step r device d matches its queries against shard
    (d + r) mod D.  Communication per step is one [I, K, 128] ppermute over
    ICI/DCN; the padded host stacks of match_pairs_sharded never exist.
    Returns (out [D, R, I, I, max_out, 2], cnt [D, R, I, I]) with
    R = num_rots ring rotations, where out[d, r, qi, di] are matches of
    global image d·I+qi (queries) against (d+r)%D·I+di; lanes with
    global_q >= global_db are masked to cnt = -1 (each unordered pair is
    produced exactly once, i < j, matching KeyMatchFull's j<i traversal
    direction, src/KeyMatchFull.cpp:105-151).  num_rots < D runs a BANDED
    ring: pair (i, j) lands at rotation (shard(j) − shard(i)) mod D, so a
    window-limited pair list needs only the rotations its shard distances
    reach — the all-pairs work reduction `--window` gets on the
    single-device path (src/KeyMatchFull.cpp:117-121)."""
    D = mesh.devices.size
    axis = mesh.axis_names[0]
    perm = [(i, (i - 1) % D) for i in range(D)]

    def local(tab, cnt, want_l):
        tab = tab[0]
        cnt = cnt[0]
        want_l = None if want_l is None else want_l[0]  # [R, I, I] bool
        I = tab.shape[0]
        me = jax.lax.axis_index(axis)
        qi_flat = jnp.arange(I * I, dtype=jnp.int32) // I
        di_flat = jnp.arange(I * I, dtype=jnp.int32) % I

        def match_block(db_tab, db_cnt, src, r):
            gq = me.astype(jnp.int32) * I + qi_flat
            gd = src.astype(jnp.int32) * I + di_flat

            def one(qi, di):
                return _match_one_compact(tab[qi], db_tab[di], cnt[qi],
                                          db_cnt[di], ratio_sq, block,
                                          max_out, out_dtype)
            m, c = jax.vmap(one)(qi_flat, di_flat)
            # Only i < j lanes are real; mask the rest with -1.  With a
            # requested-pair lane mask, not-requested lanes are dropped
            # here too, so the host decode touches requested pairs only.
            want = (gq < gd) & (cnt[qi_flat] > 0) & (db_cnt[di_flat] > 0)
            if want_l is not None:
                wr = jax.lax.dynamic_slice(
                    want_l, (r, jnp.int32(0), jnp.int32(0)), (1, I, I))
                want = want & wr.reshape(I * I)
            c = jnp.where(want, c, -1)
            return (m.reshape(I, I, max_out, 2), c.reshape(I, I))

        def step(r, carry):
            db_tab, db_cnt, outs, cnts = carry
            src = (me + r) % D
            m, c = match_block(db_tab, db_cnt, src, r)
            zi = jnp.int32(0)
            outs = jax.lax.dynamic_update_slice(
                outs, m[None], (r, zi, zi, zi, zi))
            cnts = jax.lax.dynamic_update_slice(cnts, c[None], (r, zi, zi))
            db_tab = jax.lax.ppermute(db_tab, axis, perm)
            db_cnt = jax.lax.ppermute(db_cnt, axis, perm)
            return db_tab, db_cnt, outs, cnts

        outs0 = jnp.zeros((num_rots, I, I, max_out, 2), out_dtype)
        cnts0 = jnp.full((num_rots, I, I), -1, jnp.int32)
        _, _, outs, cnts = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(num_rots), step,
            (tab, cnt, outs0, cnts0))
        return outs[None], cnts[None]

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(AXIS), P(AXIS), P(AXIS)),
                   out_specs=(P(AXIS), P(AXIS)), check_vma=False)
    return fn(table, counts, lane_want)


class ShardedDescriptorTable:
    """Descriptor table SHARDED over images across the mesh — for
    collections whose descriptors exceed one device's memory.  Matching
    runs as a ppermute ring pass (one shard rotation per step) with the
    table permanently device-resident."""

    def __init__(self, descs: Sequence[np.ndarray], mesh: Mesh,
                 block: int = 2048):
        from bundler_sfm_tpu.parallel.mesh import globalize
        self.mesh = mesh
        D = mesh.devices.size
        maxk = max((len(d) for d in descs), default=1) or 1
        self.block = min(block, _round_up(maxk, 512))
        kmax = _round_up(maxk, self.block)
        self.num_images = len(descs)
        I = _round_up(-(-len(descs) // D), 1)
        self.images_per_shard = I
        int_in = all(np.issubdtype(np.asarray(d).dtype, np.integer)
                     for d in descs) if descs else True
        dtype = np.int8 if int_in else np.float32
        table = np.zeros((D, I, kmax, 128), dtype=dtype)
        counts = np.zeros((D, I), dtype=np.int32)
        for i, d in enumerate(descs):
            table[i // I, i % I, :len(d)] = _prep_desc(d)
            counts[i // I, i % I] = len(d)
        self.table = globalize(table, mesh, P(AXIS))
        self.counts = globalize(counts, mesh, P(AXIS))

    def match_all_pairs(self, ratio: float = 0.6, min_matches: int = 16,
                        max_out: int = 2048, num_rots: int = None,
                        lane_want: np.ndarray = None
                        ) -> Dict[Tuple[int, int], np.ndarray]:
        D = self.mesh.devices.size
        num_rots = D if num_rots is None else max(1, min(num_rots, D))
        max_out = min(max_out, self.table.shape[2])
        out_dtype = jnp.int16 if self.table.shape[2] <= 32767 else jnp.int32
        from bundler_sfm_tpu.parallel.mesh import fetch, globalize
        lw = None if lane_want is None else \
            globalize(np.asarray(lane_want, bool), self.mesh, P(AXIS))
        m, c = _ring_match_all_pairs(
            self.table, self.counts, jnp.float32(ratio * ratio), self.mesh,
            self.block, max_out, out_dtype, num_rots, lw)
        m = fetch(m, self.mesh)
        c = fetch(c, self.mesh)
        D, R, I = c.shape[:3]
        # Vectorized decode: one argwhere over the count grid, then one
        # slice per SURVIVING pair — the former O(D·R·I·I) Python loop with
        # per-lane int() conversions was the host tail at >=1024 images.
        out: Dict[Tuple[int, int], np.ndarray] = {}
        hits = np.argwhere(c >= min_matches)
        if len(hits):
            dd, rr, qq, ii = hits.T
            gi = dd * I + qq
            gj = ((dd + rr) % D) * I + ii
            ns = c[dd, rr, qq, ii]
            for k in range(len(hits)):
                out[(int(gi[k]), int(gj[k]))] = \
                    m[dd[k], rr[k], qq[k], ii[k], :ns[k]].astype(np.int32)
        return out

    def match_pairs(self, pairs: Sequence[Tuple[int, int]],
                    ratio: float = 0.6, min_matches: int = 0,
                    max_out: int = 2048, **_ignored
                    ) -> Dict[Tuple[int, int], np.ndarray]:
        """DescriptorTable.match_pairs-compatible entry: run the ring pass
        (each device holds 1/D of the table — the production multi-device
        path; the replicated-table matcher won't fit photo-tourism scale)
        and filter to the requested pair list.

        CONTRACT: pairs must be CANONICAL (i < j) — 2-NN ratio matching is
        asymmetric and the ring only computes the i-queries-j direction
        (the KeyMatchFull direction); a reversed request would silently
        mean a different match set.  A window-limited pair list runs a
        BANDED ring: only the shard-distance rotations the pair list
        reaches are executed (the multi-device analogue of
        `src/KeyMatchFull.cpp:117-121`'s banding).  With min_matches == 0,
        requested pairs with zero matches appear as empty entries, like
        the single-device DescriptorTable."""
        bad = [(a, b) for (a, b) in pairs if a >= b]
        if bad:
            raise ValueError(
                f"match_pairs requires canonical (i < j) pairs; got {bad[:3]}"
                f"{'...' if len(bad) > 3 else ''}")
        D = self.mesh.devices.size
        I = self.images_per_shard
        num_rots = 1 + max(((b // I) - (a // I)) % D for (a, b) in pairs) \
            if pairs else 1
        # Requested-pair lane mask: not-requested lanes are masked on
        # device (c = -1) inside the banded rotations, so the decode
        # touches exactly the requested pairs.
        pa = np.array([a for a, _ in pairs], np.int64)
        pb = np.array([b for _, b in pairs], np.int64)
        lane_want = np.zeros((D, num_rots, I, I), bool)
        lane_want[pa // I, (pb // I - pa // I) % D, pa % I, pb % I] = True
        allp = self.match_all_pairs(ratio=ratio, min_matches=1,
                                    max_out=max_out, num_rots=num_rots,
                                    lane_want=lane_want)
        empty = np.zeros((0, 2), np.int32)
        out: Dict[Tuple[int, int], np.ndarray] = {}
        for (a, b) in pairs:
            m = allp.get((a, b))
            if m is None:
                if min_matches == 0:
                    out[(a, b)] = empty
                continue
            if len(m) >= min_matches:
                out[(a, b)] = m
        return out


@functools.partial(jax.jit, static_argnames=("mesh", "block"))
def _match_sharded(descA, descB, countA, countB, ratio_sq, mesh: Mesh,
                   block: int):
    def local(a, b, ca, cb):
        return _match_batch_kernel(a, b, ca, cb, ratio_sq, block)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
                   out_specs=(P(AXIS), P(AXIS)))
    return fn(descA, descB, countA, countB)


def match_pairs_sharded(
    descs: Sequence[np.ndarray],
    pairs: Sequence[Tuple[int, int]],
    mesh: Mesh,
    ratio: float = 0.6,
    block: int = 1024,
    min_matches: int = 16,
    pairs_per_device: int = 8,
) -> Dict[Tuple[int, int], np.ndarray]:
    """Shard the pair list over `mesh` and match every pair on the MXU."""
    if not pairs:
        return {}
    D = mesh.devices.size
    kmax = _round_up(
        max(max(len(descs[i]), len(descs[j])) for i, j in pairs), block)
    padded = {}

    def get(i):
        if i not in padded:
            padded[i] = _pad_to(_prep_desc(descs[i]), kmax)
        return padded[i]

    out: Dict[Tuple[int, int], np.ndarray] = {}
    chunk_size = D * pairs_per_device
    for start in range(0, len(pairs), chunk_size):
        chunk = list(pairs[start:start + chunk_size])
        n_real = len(chunk)
        while len(chunk) < chunk_size:
            chunk.append(chunk[0])
        A = np.stack([get(i) for i, _ in chunk])
        B = np.stack([get(j) for _, j in chunk])
        ca = np.array([len(descs[i]) for i, _ in chunk], np.int32)
        cb = np.array([len(descs[j]) for _, j in chunk], np.int32)
        i0, acc = _match_sharded(jnp.asarray(A), jnp.asarray(B),
                                 jnp.asarray(ca), jnp.asarray(cb),
                                 jnp.float32(ratio * ratio), mesh, block)
        i0 = np.asarray(i0)
        acc = np.asarray(acc)
        for p in range(n_real):
            i, j = chunk[p]
            idx1 = np.nonzero(acc[p])[0].astype(np.int32)
            m = np.stack([idx1, i0[p, idx1].astype(np.int32)], axis=1)
            m = prune_double_matches(m)
            if len(m) >= min_matches:
                out[(i, j)] = m
    return out
