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
    _match_batch_kernel, _pad_to, _prep_desc, _round_up,
    prune_double_matches,
)

AXIS = "shard"


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
