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
