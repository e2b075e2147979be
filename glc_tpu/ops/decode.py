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


def blocks_from_frames(
    q: jnp.ndarray,        # [..., C, n] int16
    scales: jnp.ndarray,   # [..., C] f32
    raw_pcm: jnp.ndarray,  # [..., C, frame_size] int16
    is_raw: jnp.ndarray,   # [...] bool
    cos_table: jnp.ndarray,
    window: jnp.ndarray,
    norm,
    *,
    max_q: float = 32768.0,
    window_raw: bool = False,
) -> jnp.ndarray:
    """Dequantize + IMDCT + window + raw-PCM select → blocks [..., C, 2n].

    Pure local math (no cross-frame coupling) — reused verbatim inside
    shard_map bodies by glc_tpu.parallel.sharded.
    """
    sc = jnp.maximum(scales, np.float32(1e-12))
    coeffs = (q.astype(jnp.float32) / np.float32(max_q)) * sc[..., None]
    out = imdct(coeffs, cos_table, norm) * window
    raw_f = raw_pcm.astype(jnp.float32) / np.float32(32767.0)
    if window_raw:
        raw_f = raw_f * window
    return jnp.where(is_raw[..., None, None], raw_f, out)


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

    blocks = blocks_from_frames(
        q, scales, raw_pcm, is_raw, cos_table, window, norm,
        max_q=max_q, window_raw=window_raw,
    )

    first = blocks[..., :n]
    second = blocks[..., n:]
    prev = jnp.concatenate([carry[None], second[:-1]], axis=0)
    hops = first + prev
    new_carry = jnp.take(second, jnp.maximum(num_valid - 1, 0), axis=0)
    return hops, new_carry


@partial(jax.jit, static_argnames=("K", "C", "n", "max_q", "window_raw",
                                   "out_i16", "out_frames"))
def decode_chunk_sparse_device(
    pos: jnp.ndarray,        # [budget] int32 flat positions into [K*C*n]
                             #   (fill entries point past the end → dropped)
    vals: jnp.ndarray,       # [budget] int16 quantized values
    scales: jnp.ndarray,     # [K, C] f32
    raw_rows: jnp.ndarray,   # [R, C, frame_size] int16 raw frames only
    raw_idx: jnp.ndarray,    # [R] int32 frame indices (fill entries = K)
    is_raw: jnp.ndarray,     # [K] bool
    carry: jnp.ndarray,      # [C, n] f32
    num_valid: jnp.ndarray,  # scalar i32
    cos_table: jnp.ndarray,
    window: jnp.ndarray,
    norm: jnp.ndarray,
    *,
    K: int,
    C: int,
    n: int,
    max_q: float = 32768.0,
    window_raw: bool = False,
    out_i16: bool = False,
    out_frames: int = 0,
):
    """Transfer-minimal decode: the host uploads sparse (position, value)
    pairs and only the raw frames that exist; the dense scatter happens in
    HBM.  Same math as `decode_chunk_device` afterwards.

    out_i16=True applies the exporters' f32→i16 conversion on device
    (×32767, clamp, truncate toward zero — audio.rs:9-16) before download,
    halving output transfer for file-export paths (within 1 LSB of the
    host-side conversion; the differently-fused program can shift hops by
    ±1 ulp).
    out_frames>0 additionally slices the output to the first `out_frames`
    frames on device (bucketed by the caller) so padding never crosses the
    link.
    """
    frame_size = 2 * n
    q = (
        jnp.zeros(K * C * n, jnp.int16)
        .at[pos].set(vals, mode="drop")
        .reshape(K, C, n)
    )
    raw = (
        jnp.zeros((K, C, frame_size), jnp.int16)
        .at[raw_idx].set(raw_rows, mode="drop")
    )
    hops, new_carry = decode_chunk_device(
        q, scales, raw, is_raw, carry, num_valid, cos_table, window, norm,
        max_q=max_q, window_raw=window_raw,
    )
    if out_frames:
        hops = hops[:out_frames]
    if out_i16:
        # barriers pin both the f32 hops and the f32 product so XLA cannot
        # evaluate ×32767 in excess precision before trunc — keeps
        # decode_i16 bit-identical to host-side convert_f32_to_i16(decode())
        hops = jax.lax.optimization_barrier(hops)
        prod = jax.lax.optimization_barrier(hops * np.float32(32767.0))
        hops = jnp.trunc(
            jnp.clip(prod, np.float32(-32768.0), np.float32(32767.0))
        ).astype(jnp.int16)
    return hops, new_carry
