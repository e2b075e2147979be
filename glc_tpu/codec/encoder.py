"""GLC encoder: host framing → device MDCT/mask/quantize → container assembly.

API mirrors the reference (reference src/codec.rs:396-566):

    enc = Encoder(sample_rate)
    encoded = enc.encode(samples, channels)   # samples: interleaved float32

The reference parallelizes over frames with rayon (codec.rs:462); here the
frame axis is the batch axis of one jitted device call per chunk, and the
ragged sparse lists are compacted host-side with vectorized numpy.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..config import CodecConfig, DEFAULT_CONFIG
from ..container.schema import (
    PAIR_DTYPE,
    AudioHeader,
    EncodedAudio,
    FrameSet,
    GaplessInfo,
)
from ..ops.encode import encode_chunk_device
from .tables import chunk_size_for, get_device_tables


def frame_signal(samples: np.ndarray, channels: int, cfg: CodecConfig):
    """Deinterleave + pad, mirroring reference src/codec.rs:427-455.

    Returns (padded [C, P] float32, num_frames, padding, per_channel_len).
    Padding: hop/2 leading zeros, pad to hop multiple, hop/2 trailing zeros.
    """
    hop, frame = cfg.hop_size, cfg.frame_size
    samples = np.asarray(samples, np.float32)
    if channels <= 0:
        raise ValueError("channels must be >= 1")
    if len(samples) % channels != 0:
        raise ValueError(
            f"interleaved sample count {len(samples)} not divisible by "
            f"channels {channels}"
        )
    T = len(samples) // channels
    x = samples.reshape(T, channels).T  # [C, T]

    lead = hop // 2
    rem = (lead + T) % hop
    mid_pad = (hop - rem) if rem else 0
    P = lead + T + mid_pad + lead
    padded = np.zeros((channels, P), np.float32)
    padded[:, lead : lead + T] = x

    num_frames = 1 if P < frame else (P - frame) // hop + 1
    padding = P - T - lead  # codec.rs:546
    return padded, num_frames, padding, T


class Encoder:
    """reference src/codec.rs:396-418.

    Stateless in practice (Q8): all state is immutable precomputed tables,
    so `encode` is a pure function of its inputs.
    """

    def __init__(self, sample_rate: int, config: Optional[CodecConfig] = None):
        self.sample_rate = int(sample_rate)
        self.config = config or DEFAULT_CONFIG
        # Warm the table caches (mirrors MdctTables::new + PerceptualWeights::new
        # in Encoder::new, codec.rs:406-418).
        self._tables = get_device_tables(
            self.config.n, self.config.frame_size, self.sample_rate
        )

    def encode(self, samples: np.ndarray, channels: int) -> EncodedAudio:
        """Encode interleaved PCM to the GLC container (codec.rs:421-565)."""
        cfg = self.config
        hop, frame_size, n = cfg.hop_size, cfg.frame_size, cfg.n
        C = int(channels)
        samples = np.asarray(samples, np.float32)
        total_samples = len(samples)
        if total_samples == 0:
            raise ValueError("cannot encode empty input")

        padded, F, padding, _T = frame_signal(samples, C, cfg)
        tb = self._tables

        # Framed view [C, F, 2048] without copying: stride by hop.
        sC, sP = padded.strides
        frames_view = np.lib.stride_tricks.as_strided(
            padded, shape=(C, F, frame_size), strides=(sC, sP * hop, sP),
            writeable=False,
        )

        chunk = chunk_size_for(F, cfg.encode_chunk_frames)

        nnz_all = np.empty((F, C), np.int64)
        scales_all = np.empty((F, C), np.float32)
        raw_mask_all = np.empty(F, bool)
        pair_parts = []
        raw_parts = []

        for start in range(0, F, chunk):
            valid = min(chunk, F - start)
            blocks = np.zeros((chunk, C, frame_size), np.float32)
            # [C, valid, 2048] -> [valid, C, 2048]
            blocks[:valid] = frames_view[:, start : start + valid].transpose(1, 0, 2)

            q, nnz, scale, raw, use_raw = encode_chunk_device(
                jax.device_put(blocks),
                tb.cos_table, tb.window, tb.norm,
                tb.band_mask, tb.band_inv_count, tb.band_pf, tb.band_of, tb.inv_w,
                quality=cfg.quality_factor,
                noise_floor_db=cfg.noise_floor_db,
                compression_threshold=cfg.compression_threshold,
                max_q=cfg.max_q,
            )
            q = np.asarray(q)[:valid]
            nnz = np.asarray(nnz)[:valid]
            scale = np.asarray(scale)[:valid]
            use_raw = np.asarray(use_raw)[:valid]

            scales_all[start : start + valid] = scale
            raw_mask_all[start : start + valid] = use_raw
            nnz_all[start : start + valid] = np.where(use_raw[:, None], 0, nnz)

            comp = ~use_raw
            if comp.any():
                qc = np.where(comp[:, None, None], q, np.int16(0))
                fidx, cidx, kidx = np.nonzero(qc)
                pairs = np.empty(len(kidx), PAIR_DTYPE)
                pairs["k"] = kidx.astype(np.uint16)
                pairs["q"] = qc[fidx, cidx, kidx]
                pair_parts.append(pairs)
            if use_raw.any():
                raw_np = np.asarray(raw)[:valid]
                # channel-major flatten — the reference's actual storage
                # layout (codec.rs:471-503, quirk Q13)
                raw_parts.append(raw_np[use_raw].reshape(-1, C * frame_size))

        pairs_all = (
            np.concatenate(pair_parts) if pair_parts else np.empty(0, PAIR_DTYPE)
        )
        raw_all = (
            np.concatenate(raw_parts)
            if raw_parts
            else np.empty((0, C * frame_size), np.int16)
        )

        fs = FrameSet(nnz_all, pairs_all, scales_all, raw_mask_all, raw_all,
                      frame_size)
        return EncodedAudio(
            header=AudioHeader(self.sample_rate, C, total_samples),
            frame_set=fs,
            gapless_info=GaplessInfo(
                encoder_delay=hop // 2,
                padding=padding,
                original_length=total_samples,
            ),
        )
