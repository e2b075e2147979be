"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "frames"),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a mesh over the first `n_devices` devices.

    Default layout is 2D ('data', 'frames'): the 'data' axis shards
    independent streams (files / batch), the 'frames' axis shards the frame
    axis of one stream (the context-parallel direction, where the OLA halo
    travels).  The default shape keeps 'data' small — (2, n/2) for even
    n ≥ 4, else (1, n) — so the halo path always has ≥ 2 'frames' shards
    while exercising both axes; pass `shape` explicitly to shard a single
    long stream over every device, e.g. shape=(1, n).
    """
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} present")
    devices = devices[:n]

    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        else:
            # favor the frames axis; 'data' absorbs the remainder factor
            frames = n
            data = 1
            if n % 2 == 0 and n >= 4:
                data, frames = 2, n // 2
            shape = (data, frames)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")

    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))
