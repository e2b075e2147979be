"""Device-side encode pipeline: window → MDCT → masking → quantize → stats.

One jitted call processes a fixed-size chunk of frames for all channels at
once: ``blocks [K, C, frame_size] → (q, nnz, scales, raw_pcm, use_raw)``.
This replaces the reference's rayon `par_iter` over frames
(reference src/codec.rs:462-541) with frame-major batched tensor ops: the MDCT
is one MXU matmul over all K·C blocks, the masking thresholds are a band
matmul, and the keep/quantize gate is fused elementwise VPU work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mdct import mdct
from .psycho import masking_thresholds

# 10^(NOISE_FLOOR_DB/20) with NOISE_FLOOR_DB=-48 (codec.rs:22,277), f32.
def _noise_floor_linear(noise_floor_db: float) -> np.float32:
    return np.float32(10.0 ** float(np.float32(noise_floor_db) / np.float32(20.0)))


def round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """Rust f32::round semantics: round half away from zero.

    jnp.round rounds half-to-even, which would disagree with the reference on
    exact .5 ties (SURVEY.md §7 hard part #2).
    """
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + np.float32(0.5))


@partial(
    jax.jit,
    static_argnames=("quality", "noise_floor_db", "compression_threshold", "max_q"),
)
def encode_chunk_device(
    blocks: jnp.ndarray,       # [K, C, frame_size] f32, un-windowed
    cos_table: jnp.ndarray,    # [n, frame_size] f32
    window: jnp.ndarray,       # [frame_size] f32
    norm: jnp.ndarray,         # scalar f32
    band_mask: jnp.ndarray,
    band_inv_count: jnp.ndarray,
    band_pf: jnp.ndarray,
    band_of: jnp.ndarray,
    inv_w: jnp.ndarray,
    *,
    quality: float = 0.7,
    noise_floor_db: float = -48.0,
    compression_threshold: float = 0.85,
    max_q: float = 32768.0,
):
    """Returns (q int16 [K,C,n], nnz int32 [K,C], scales f32 [K,C],
    raw_pcm int16 [K,C,frame_size], use_raw bool [K]).

    Semantics per reference src/codec.rs:462-541:
      * scale = max |coeff| clamped ≥ 1e-10 (codec.rs:488)
      * keep iff |coeff| > noise_floor·scale AND |coeff| > threshold·scale
        (codec.rs:291; the variable-bit path is a vestigial keep-gate only,
        SURVEY.md Q3)
      * q = round(coeff/scale · 2^15) half-away-from-zero, clamped to i16,
        dropped if 0 (codec.rs:299-306)
      * raw fallback PCM = windowed samples ×32767, clamped, truncated toward
        zero (Rust `as i16`, codec.rs:501)
      * use_raw iff estimated compressed size ≥ 0.85 × raw size
        (codec.rs:506-521)
    """
    K, C, frame_size = blocks.shape

    win = blocks * window
    coeffs = mdct(win, cos_table, norm)              # [K, C, n]
    absc = jnp.abs(coeffs)
    scale = jnp.maximum(jnp.max(absc, axis=-1), np.float32(1e-10))  # [K, C]

    thr = masking_thresholds(
        coeffs, scale[..., None], band_mask, band_inv_count, band_pf,
        band_of, inv_w, quality,
    )

    nf_lin = _noise_floor_linear(noise_floor_db) * scale             # [K, C]
    qf = round_half_away((coeffs / scale[..., None]) * np.float32(max_q))
    qf = jnp.clip(qf, np.float32(-32768.0), np.float32(32767.0))
    keep = (
        (absc > nf_lin[..., None])
        & (absc > thr * scale[..., None])
        & (qf != np.float32(0.0))
    )
    q = jnp.where(keep, qf, np.float32(0.0)).astype(jnp.int16)
    nnz = jnp.sum(keep, axis=-1, dtype=jnp.int32)                    # [K, C]

    raw = jnp.trunc(
        jnp.clip(win * np.float32(32767.0), np.float32(-32768.0), np.float32(32767.0))
    ).astype(jnp.int16)

    # Per-frame size model (codec.rs:506-521)
    comp_size = (
        jnp.sum(8 + 4 * nnz, axis=1) + 8 + 4 * C + 64
    ).astype(jnp.float32)
    raw_size = np.float32(frame_size * C * 2)
    use_raw = comp_size >= raw_size * np.float32(compression_threshold)

    return q, nnz, scale, raw, use_raw
