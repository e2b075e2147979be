"""Device-side decode pipeline: dequantize → IMDCT → window → overlap-add.

Replaces the reference's batch-parallel decode + sequential overlap buffer
(reference src/codec.rs:615-729) with one batched IMDCT matmul and a *shifted
add*: overlap-add with 50% hop is associative —

    hop[f] = first_half(block[f]) + second_half(block[f-1])

so the whole chunk is two slices and one add, with a single [C, n] carry
between chunks (and the same carry is the 1-hop halo exchanged between devices
when the frame axis is sharded, see glc_tpu.parallel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mdct import imdct


@partial(jax.jit, static_argnames=("max_q", "window_raw"))
def decode_chunk_device(
    q: jnp.ndarray,          # [K, C, n] int16 dense quantized coeffs
    scales: jnp.ndarray,     # [K, C] f32
    raw_pcm: jnp.ndarray,    # [K, C, frame_size] int16 (zeros where not raw)
    is_raw: jnp.ndarray,     # [K] bool
    carry: jnp.ndarray,      # [C, n] f32 — second half of the previous block
    num_valid: jnp.ndarray,  # scalar i32 — frames actually present in chunk
    cos_table: jnp.ndarray,
    window: jnp.ndarray,
    norm: jnp.ndarray,
    *,
    max_q: float = 32768.0,
    window_raw: bool = False,
):
    """Returns (hops f32 [K, C, n], new_carry f32 [C, n]).

    Semantics per reference src/codec.rs:620-729:
      * coeff = (q / 2^15) · max(scale, 1e-12)  (codec.rs:653-663)
      * MDCT frames: IMDCT then synthesis window (codec.rs:669-675)
      * raw frames: i16/32767, NOT re-windowed (codec.rs:626-643, quirk Q4;
        pass window_raw=True for the clean Princen-Bradley path)
      * overlap-add: hop[i] = overlap[i] + block[i], overlap ← block[n:2n]
        (codec.rs:688-705), expressed as a shifted add
    """
    K, C, n = q.shape

    sc = jnp.maximum(scales, np.float32(1e-12))
    coeffs = (q.astype(jnp.float32) / np.float32(max_q)) * sc[..., None]
    out = imdct(coeffs, cos_table, norm) * window          # [K, C, 2n]

    raw_f = raw_pcm.astype(jnp.float32) / np.float32(32767.0)
    if window_raw:
        raw_f = raw_f * window
    blocks = jnp.where(is_raw[:, None, None], raw_f, out)

    first = blocks[..., :n]
    second = blocks[..., n:]
    prev = jnp.concatenate([carry[None], second[:-1]], axis=0)
    hops = first + prev
    new_carry = jnp.take(second, jnp.maximum(num_valid - 1, 0), axis=0)
    return hops, new_carry
