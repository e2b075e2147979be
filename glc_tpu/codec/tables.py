"""Device-resident table cache shared by encoder and decoder."""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import numpy as np

from ..ops.mdct import get_mdct_tables
from ..ops.psycho import get_perceptual_tables


class DeviceTables(NamedTuple):
    cos_table: jax.Array   # [n, frame_size] f32
    window: jax.Array      # [frame_size] f32
    norm: jax.Array        # scalar f32
    band_mask: jax.Array
    band_inv_count: jax.Array
    band_pf: jax.Array
    band_of: jax.Array
    inv_w: jax.Array


@lru_cache(maxsize=16)
def get_device_tables(n: int, frame_size: int, sample_rate: int) -> DeviceTables:
    mt = get_mdct_tables(n, frame_size)
    pt = get_perceptual_tables(n, sample_rate)
    put = jax.device_put
    return DeviceTables(
        cos_table=put(mt.cos_table),
        window=put(mt.window),
        norm=put(np.float32(mt.norm)),
        band_mask=put(pt.band_mask),
        band_inv_count=put(pt.band_inv_count),
        band_pf=put(pt.band_pf),
        band_of=put(pt.band_of),
        inv_w=put(pt.inv_w),
    )


def pow2_bucket(count: int, cap: int, floor: int = 16) -> int:
    """Smallest power-of-two ≥ count (starting at `floor`), capped at `cap`.

    Bucketing device-shape parameters keeps the set of compiled XLA
    programs O(log) instead of one per data-dependent size.
    """
    b = floor
    while b < count and b < cap:
        b *= 2
    return min(b, cap)


def chunk_size_for(num_frames: int, max_chunk: int) -> int:
    """Power-of-two frame-chunk size ≥ num_frames, capped at max_chunk."""
    return pow2_bucket(num_frames, max_chunk, floor=128)
