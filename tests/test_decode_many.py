"""Decoder.decode_many — the decode-side analog of Encoder.encode_many.

Same-bucket single-chunk tracks decode through ONE batched device program
(lax.map over the shared packed-decode body); everything else falls back to
per-file decode_i16.  Per-track outputs must equal decode_i16 within 1 LSB
(the batched program is the same traced body, but XLA may fuse the IMDCT
chain differently under lax.map).  No reference analog: the GUI album
export decodes files serially (reference src/ui.rs:317-359).
"""

import numpy as np
import pytest

from utils import generate_sine_wave, generate_white_noise

from glc_tpu import Decoder, Encoder
from glc_tpu.album import decode_playlist
from glc_tpu.container.bincode import save_encoded


def _i16(x):
    return np.clip(x * 32767.0, -32768, 32767).astype(np.int16)


@pytest.fixture(scope="module")
def enc():
    return Encoder(44100)


def _assert_within_1lsb(a, b):
    assert a.shape == b.shape
    assert int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max(
        initial=0)) <= 1


def test_decode_many_matches_serial_same_bucket(enc):
    """Identical-length tonal tracks share every bucket → one batch."""
    tracks = [
        generate_sine_wave(440.0, 44100, 2, 1.0),
        generate_sine_wave(660.0, 44100, 2, 1.0),
        generate_sine_wave(880.0, 44100, 2, 1.0),
    ]
    encodeds = [enc.encode(t, 2) for t in tracks]
    dec = Decoder(2, 44100)
    outs = dec.decode_many(encodeds)
    for ea, out, src in zip(encodeds, outs, tracks):
        ref = dec.decode_i16(ea)
        assert len(out) == len(src)
        _assert_within_1lsb(out, ref)


def test_decode_many_mixed_buckets_and_raw(enc):
    """Different lengths + a raw-PCM track: multiple groups + fallbacks,
    results in input order."""
    tracks = [
        generate_sine_wave(440.0, 44100, 2, 0.4),
        generate_white_noise(44100, 2, 0.4, 3) * np.float32(0.5),  # raw path
        generate_sine_wave(550.0, 44100, 2, 1.3),
        generate_sine_wave(330.0, 44100, 2, 0.4),
    ]
    encodeds = [enc.encode(t, 2) for t in tracks]
    assert int(encodeds[1].frame_set.raw_mask.sum()) > 0
    dec = Decoder(2, 44100)
    outs = dec.decode_many(encodeds)
    for ea, out, src in zip(encodeds, outs, tracks):
        assert len(out) == len(src)
        _assert_within_1lsb(out, dec.decode_i16(ea))


def test_decode_many_multichunk_falls_back(enc):
    """A track longer than one decode chunk takes the serial path but still
    lands in order next to batched peers."""
    from dataclasses import replace

    from glc_tpu.config import DEFAULT_CONFIG

    cfg = replace(DEFAULT_CONFIG, decode_chunk_frames=128)
    tracks = [
        generate_sine_wave(440.0, 44100, 1, 0.5),
        generate_sine_wave(220.0, 44100, 1, 3.5),  # > 128 frames
        generate_sine_wave(880.0, 44100, 1, 0.5),
    ]
    encodeds = [enc.encode(t, 1) for t in tracks]
    assert encodeds[1].frame_set.num_frames > 128
    dec = Decoder(1, 44100, config=cfg)
    outs = dec.decode_many(encodeds)
    for ea, out, src in zip(encodeds, outs, tracks):
        assert len(out) == len(src)
        _assert_within_1lsb(out, dec.decode_i16(ea))


def test_decode_playlist_uses_batch(tmp_path, enc):
    """decode_playlist routes through decode_many and concatenates
    gaplessly (reference tests/test_codec.rs:139-170)."""
    tracks = [generate_sine_wave(f, 44100, 2, 0.5) for f in (440.0, 660.0)]
    paths = []
    for i, t in enumerate(tracks):
        p = tmp_path / f"t{i}.glc"
        save_encoded(enc.encode(t, 2), p)
        paths.append(p)

    samples, rate, channels = decode_playlist(paths)
    assert (rate, channels) == (44100, 2)
    assert len(samples) == sum(len(t) for t in tracks)
    # the concatenation equals per-file serial decodes back-to-back (1 LSB)
    dec = Decoder(2, 44100)
    ref = np.concatenate(
        [dec.decode_i16(enc.encode(t, 2)) for t in tracks]
    )
    _assert_within_1lsb(samples, ref)
