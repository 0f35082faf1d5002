"""Device-mesh helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(num_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """One-axis mesh over the first `num_devices` local devices.

    SfM workloads shard naturally along one data axis (images for
    extraction, pairs for matching, landmarks for BA), so a 1-D mesh covers
    every stage; multi-host runs extend the same axis across DCN via
    jax.distributed initialisation before calling this.
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))
