"""Device-mesh helpers.

The reference has no distributed runtime (SURVEY.md §2.4); this layer is the
framework's NCCL-equivalent: `jax.sharding.Mesh` + shard_map with XLA
collectives (psum/all_gather) over ICI, `jax.distributed` for multi-host.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_name: str = "shard") -> Mesh:
    devs = jax.devices()
    n = num_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (`jax.distributed.initialize`); DCN handles the
    cross-host legs of the collectives."""
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def globalize(arr, mesh: Mesh, spec: P):
    """Host array -> jax.Array laid out per `spec` on `mesh`.

    Single-process: a plain device transfer.  Multi-process (mesh spanning
    hosts): every process holds the SAME host array (SPMD host replication)
    and contributes its addressable shards — the standard jax multihost
    input path (`make_array_from_callback`)."""
    import jax.numpy as jnp
    if arr is None:
        return None
    if jax.process_count() == 1:
        return jnp.asarray(arr)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx])


def fetch(x, mesh: Mesh) -> np.ndarray:
    """Device array -> host numpy on EVERY process.

    A mesh-sharded output is not fully addressable on a multi-process mesh;
    reshard it to replicated (one cross-host all-gather) before pulling to
    the host.  Single-process: a plain np.asarray."""
    if jax.process_count() == 1:
        return np.asarray(x)
    y = jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))(x)
    return np.asarray(y)
