"""Device-mesh construction for sharded stream processing.

The reference is single-threaded C with no parallel axes (SURVEY.md §2.12);
the parallel design here is new, TPU-native:

  * axis "ch" — data parallelism over independent channels (the analog of
    firpfbch's M independent channel streams, reference firpfbch.c:383)
  * axis "t"  — sequence parallelism over contiguous time blocks, with
    filter-tail halos exchanged between neighbors over ICI (ppermute)

Multi-host extends the same axes over DCN: time-sharding should map "t" to
intra-host ICI rings and "ch" across hosts (channels never communicate).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["stream_mesh", "P", "NamedSharding"]


def stream_mesh(n_time: int = 1, n_channel: int = 1, devices=None) -> Mesh:
    """Create a (ch, t) mesh.  n_time * n_channel must equal device count.

    Time-neighbors are placed adjacent in device order so halo ppermutes
    ride nearest-neighbor ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_time * n_channel != len(devices):
        raise ValueError(
            f"mesh {n_channel}x{n_time} != {len(devices)} devices")
    arr = np.array(devices).reshape(n_channel, n_time)
    return Mesh(arr, ("ch", "t"))
