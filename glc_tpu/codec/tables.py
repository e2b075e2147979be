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


def len_bucket(x: int, bits: int = 4) -> int:
    """Smallest m·2^e ≥ x with 2^(bits−1) ≤ m < 2^bits (a `bits`-bit-mantissa
    ladder): overshoot ≤ 2^(1−bits), ≤ 2^(bits−1) distinct values per octave.

    The finer cousin of `pow2_bucket`: a power-of-two bucket wastes up to
    2× on whatever scales with the bucketed size.  That is fine for cheap
    compute padding but NOT for host↔device transfer sizes — the link is
    the binding resource, so upload/download shapes use this ladder (e.g.
    bits=5 → ≤6.25% overshoot) and trade a few more compiled programs per
    octave for near-exact transfer volume."""
    floor = 1 << bits
    if x <= floor:
        return floor
    e = x.bit_length() - bits
    m = -(-x >> e)  # ceil(x / 2^e)
    if m >= (1 << bits):
        return (1 << (bits - 1)) << (e + 1)
    return m << e


def chunk_size_for(num_frames: int, max_chunk: int) -> int:
    """Frame-chunk size ≥ num_frames on the 4-bit-mantissa ladder, capped at
    max_chunk (≤12.5% compute padding instead of pow2's ≤2×; the download
    is prefix-sliced on device, so only compute scales with the bucket)."""
    return min(max(len_bucket(num_frames, 4), 128), max_chunk)
