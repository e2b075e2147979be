"""Decoder.decode_many — the decode-side analog of Encoder.encode_many.

Same-bucket single-chunk tracks decode through ONE batched device program
(lax.map over the shared packed-decode body); singleton buckets dispatch the
single-track program on the same pre-packed buffer; multi-chunk tracks batch
at SEGMENT level with device-chained carries (decode_chunks_packed_batch_
carry_device).  Per-track outputs must equal decode_i16 within 1 LSB
(the batched program is the same traced body, but XLA may fuse the IMDCT
chain differently under lax.map).  No reference analog: the GUI album
export decodes files serially (reference src/ui.rs:317-359).

Bucket subtlety the tests must respect: the pair-budget bucket depends on
CONTENT (the kept-pair count rides a 5-bit ladder), so tracks only share a
group when their material is similar — the tests use identical/equal-
density tracks to force the batch path and ASSERT it ran (a round-3 review
found the original tests silently exercising only the fallback).
"""

import numpy as np
import pytest

from utils import generate_sine_wave, generate_white_noise

from glc_tpu import Decoder, Encoder
from glc_tpu.album import decode_playlist
from glc_tpu.container.bincode import save_encoded


@pytest.fixture(scope="module")
def enc():
    return Encoder(44100)


def _assert_within_1lsb(a, b):
    assert a.shape == b.shape
    assert int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max(
        initial=0)) <= 1


@pytest.fixture
def batch_spy(monkeypatch):
    """Count batched-program dispatches inside decode_many."""
    import glc_tpu.ops.decode as od

    calls = {"n": 0}
    real = od.decode_chunks_packed_batch_device

    def counting(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    # decode_many imports it from ops.decode at call time
    monkeypatch.setattr(od, "decode_chunks_packed_batch_device", counting)
    return calls


def test_decode_many_batches_identical_material(enc, batch_spy):
    """Identical tracks share every bucket → ONE batched dispatch, and the
    batch path's trim must preserve exact lengths (a review caught it
    dropping the last encoder_delay samples per track)."""
    src = generate_sine_wave(440.0, 44100, 2, 1.0)
    tracks = [src, src.copy(), src.copy()]
    encodeds = [enc.encode(t, 2) for t in tracks]
    dec = Decoder(2, 44100)
    outs = dec.decode_many(encodeds)
    assert batch_spy["n"] == 1, "batched device program must actually run"
    ref = dec.decode_i16(encodeds[0])
    for out, src_t in zip(outs, tracks):
        assert len(out) == len(src_t)
        _assert_within_1lsb(out, ref)


def test_decode_many_mixed_buckets_and_raw(enc, batch_spy):
    """Different material + a raw-PCM track: batched group + singleton
    dispatches + order preserved."""
    same = generate_sine_wave(440.0, 44100, 2, 0.6)
    tracks = [
        same,
        generate_white_noise(44100, 2, 0.4, 3) * np.float32(0.5),  # raw path
        same.copy(),
        generate_sine_wave(3313.0, 44100, 2, 1.1),
    ]
    encodeds = [enc.encode(t, 2) for t in tracks]
    assert int(encodeds[1].frame_set.raw_mask.sum()) > 0
    dec = Decoder(2, 44100)
    outs = dec.decode_many(encodeds)
    assert batch_spy["n"] >= 1  # tracks 0 and 2 share a group
    for ea, out, src in zip(encodeds, outs, tracks):
        assert len(out) == len(src)
        _assert_within_1lsb(out, dec.decode_i16(ea))


def test_decode_many_multichunk_falls_back(enc):
    """A track longer than one decode chunk takes the interleaved
    streaming path but still lands in order next to batched peers."""
    from dataclasses import replace

    from glc_tpu.config import DEFAULT_CONFIG

    cfg = replace(DEFAULT_CONFIG, decode_chunk_frames=128)
    short = generate_sine_wave(440.0, 44100, 1, 0.5)
    tracks = [
        short,
        generate_sine_wave(220.0, 44100, 1, 3.5),  # > 128 frames
        short.copy(),
    ]
    encodeds = [enc.encode(t, 1) for t in tracks]
    assert encodeds[1].frame_set.num_frames > 128
    dec = Decoder(1, 44100, config=cfg)
    outs = dec.decode_many(encodeds)
    for ea, out, src in zip(encodeds, outs, tracks):
        assert len(out) == len(src)
        _assert_within_1lsb(out, dec.decode_i16(ea))


def test_decode_many_results_do_not_pin_batch_buffer(enc, batch_spy):
    """Each result owns its memory (no view into the whole batch download)."""
    src = generate_sine_wave(440.0, 44100, 2, 0.5)
    encodeds = [enc.encode(src, 2), enc.encode(src.copy(), 2)]
    outs = Decoder(2, 44100).decode_many(encodeds)
    assert batch_spy["n"] == 1
    for out in outs:
        assert out.base is None or out.base.nbytes <= out.nbytes


def test_decode_playlist_uses_batch(tmp_path, enc, batch_spy):
    """decode_playlist routes through decode_many and concatenates
    gaplessly (reference tests/test_codec.rs:139-170)."""
    src = generate_sine_wave(440.0, 44100, 2, 0.5)
    tracks = [src, src.copy()]
    paths = []
    for i, t in enumerate(tracks):
        p = tmp_path / f"t{i}.glc"
        save_encoded(enc.encode(t, 2), p)
        paths.append(p)

    samples, rate, channels = decode_playlist(paths)
    assert batch_spy["n"] == 1
    assert (rate, channels) == (44100, 2)
    assert len(samples) == sum(len(t) for t in tracks)
    dec = Decoder(2, 44100)
    ref = np.concatenate([dec.decode_i16(enc.encode(t, 2)) for t in tracks])
    _assert_within_1lsb(samples, ref)


@pytest.fixture
def seg_spy(monkeypatch):
    """Count segment-batched (carry-chained) dispatches inside decode_many."""
    import glc_tpu.ops.decode as od

    calls = {"n": 0}
    real = od.decode_chunks_packed_batch_carry_device

    def counting(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(
        od, "decode_chunks_packed_batch_carry_device", counting
    )
    return calls


def test_decode_many_segmented_multichunk(enc, seg_spy):
    """segmented_batch=True: multi-chunk tracks batch at SEGMENT level
    (chunk s of every track in one dispatch, carries chained device-side)
    — including heterogeneous chunk counts (short tracks ride the tail
    segments with valid=0) and a raw-PCM track.  Per-track output ≤1 LSB
    vs decode_i16, exact lengths."""
    from dataclasses import replace

    from glc_tpu.config import DEFAULT_CONFIG

    cfg = replace(DEFAULT_CONFIG, decode_chunk_frames=128,
                  segmented_batch=True)
    tracks = [
        generate_sine_wave(440.0, 44100, 1, 3.0),   # 2 chunks of 128
        generate_sine_wave(220.0, 44100, 1, 7.0),   # 3 chunks
        generate_white_noise(44100, 1, 3.0, seed=7),  # raw frames, 2 chunks
    ]
    encodeds = [enc.encode(t, 1) for t in tracks]
    assert encodeds[0].frame_set.num_frames > 128
    assert encodeds[1].frame_set.num_frames > 2 * 128
    assert encodeds[2].frame_set.raw_mask.any()
    dec = Decoder(1, 44100, config=cfg)
    outs = dec.decode_many(encodeds)
    # one carry-chained dispatch per segment INDEX (3 = the longest track)
    assert seg_spy["n"] == 3
    for ea, out, src in zip(encodeds, outs, tracks):
        assert len(out) == len(src)
        _assert_within_1lsb(out, dec.decode_i16(ea))
        assert out.base is None or out.base.nbytes <= out.nbytes


def test_decode_many_mixes_single_and_multichunk(enc, batch_spy, seg_spy):
    """Single-chunk tracks keep the whole-track batch; multi-chunk tracks
    take the segmented path (segmented_batch=True here); results land in
    input order."""
    from dataclasses import replace

    from glc_tpu.config import DEFAULT_CONFIG

    cfg = replace(DEFAULT_CONFIG, decode_chunk_frames=128,
                  segmented_batch=True)
    short = generate_sine_wave(440.0, 44100, 1, 0.5)
    long_ = generate_sine_wave(220.0, 44100, 1, 3.5)
    tracks = [short, long_, short.copy()]
    encodeds = [enc.encode(t, 1) for t in tracks]
    dec = Decoder(1, 44100, config=cfg)
    outs = dec.decode_many(encodeds)
    assert batch_spy["n"] == 1       # the two shorts, one batch
    assert seg_spy["n"] == 2         # the long track's two segments (B=1)
    for ea, out, src in zip(encodeds, outs, tracks):
        assert len(out) == len(src)
        _assert_within_1lsb(out, dec.decode_i16(ea))


def test_decode_many_interleaved_default_bit_identical(enc, seg_spy):
    """DEFAULT path for multi-chunk tracks: round-robin interleaved
    decode_i16_stream generators — no segment-batch dispatches, and each
    track's output is BIT-identical to decode_i16 (same generator)."""
    from dataclasses import replace

    from glc_tpu.config import DEFAULT_CONFIG

    cfg = replace(DEFAULT_CONFIG, decode_chunk_frames=128)
    assert not cfg.segmented_batch
    tracks = [
        generate_sine_wave(440.0, 44100, 1, 3.0),
        generate_sine_wave(220.0, 44100, 1, 7.0),
        generate_white_noise(44100, 1, 3.0, seed=7),
        generate_sine_wave(440.0, 44100, 1, 0.5),   # single-chunk peer
    ]
    encodeds = [enc.encode(t, 1) for t in tracks]
    dec = Decoder(1, 44100, config=cfg)
    outs = dec.decode_many(encodeds)
    assert seg_spy["n"] == 0
    for ea, out, src in zip(encodeds[:3], outs[:3], tracks[:3]):
        assert len(out) == len(src)
        np.testing.assert_array_equal(out, dec.decode_i16(ea))
    _assert_within_1lsb(outs[3], dec.decode_i16(encodeds[3]))


def test_decode_i16_stats_hook_accumulates_and_is_inert():
    """The stage-attribution hook (bench's per-rep decode attribution,
    VERDICT r4 item 1) must accumulate pack/disp/wait and never change
    the decoded bytes."""
    import numpy as np

    from glc_tpu import Decoder, Encoder

    t = np.arange(44100, dtype=np.float32) / 44100
    sig = np.repeat((0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), 2)
    enc = Encoder(44100)
    dec = Decoder(2, 44100)
    ea = enc.encode(sig, 2)
    plain = dec.decode_i16(ea)
    stats: dict = {}
    with_stats = dec.decode_i16(ea, stats=stats)
    np.testing.assert_array_equal(plain, with_stats)
    assert set(stats) == {"pack_ms", "disp_ms", "wait_ms", "up_n", "down_n"}
    assert stats["pack_ms"] > 0 and stats["disp_ms"] > 0
    assert stats["wait_ms"] >= 0
    # transfer counts: one words upload per chunk, >=1 download piece per
    # chunk (bench's protocol-ceiling floor model consumes these)
    F = ea.frame_set.num_frames
    chunks = -(-F // dec.config.decode_chunk_frames)
    assert stats["up_n"] == chunks
    assert stats["down_n"] >= chunks


def test_decode_many_pipelined_mixed_geometry():
    """The cross-track pipelined scheduler must handle a playlist mixing
    mono and stereo multi-chunk tracks (different per-track C and chunk
    geometry in ONE global window), plus a single-chunk and an empty
    track, each bit-identical to its own decode_i16."""
    import numpy as np

    from glc_tpu import CodecConfig, Decoder, Encoder
    from glc_tpu.container.schema import (
        AudioHeader,
        EncodedAudio,
        FrameSet,
        GaplessInfo,
    )

    # 2 s of audio is 86 hop-frames; 32-frame chunks force GENUINE
    # multi-chunk tracks (the transfer-count assertion below pins it — an
    # earlier revision used 128 and silently exercised only the
    # single-chunk batch path)
    cfg = CodecConfig(decode_chunk_frames=32)
    enc = Encoder(44100)
    rng = np.random.default_rng(3)
    t = np.arange(2 * 44100, dtype=np.float32) / 44100

    mono = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    stereo = np.repeat(
        (0.3 * np.sin(2 * np.pi * 440 * t)
         + 0.02 * rng.standard_normal(len(t))).astype(np.float32), 2)
    short = (0.4 * np.sin(2 * np.pi * 330 * t[:4096])).astype(np.float32)
    eas = [
        enc.encode(mono, 1),
        enc.encode(stereo, 2),
        enc.encode(short, 1),             # single-chunk at 128 frames? 88
        EncodedAudio(AudioHeader(44100, 1, 0), FrameSet.empty(1),
                     GaplessInfo(512, 0, 0)),   # F == 0 fallback
        enc.encode(stereo * 0.5, 2),
    ]
    # ONE decode_many call over the mixed-channel playlist: decode_many
    # reads each track's channel count from its own header, so mono and
    # stereo multi-chunk tracks share the same global pipelined window
    dec = Decoder(2, 44100, config=cfg)
    stats: dict = {}
    got = dec.decode_many(eas, stats=stats)
    for i, ea in enumerate(eas):
        np.testing.assert_array_equal(got[i], dec.decode_i16(ea)), i
    # the stats hook counts the pipelined (multi-chunk) tracks' transfers:
    # one words upload per chunk, >=1 download piece per chunk (bench's
    # album protocol-ceiling floor model consumes these); output above is
    # already pinned identical with the hook active
    multi_chunks = sum(
        -(-ea.frame_set.num_frames // cfg.decode_chunk_frames)
        for ea in eas
        if ea.frame_set.num_frames > cfg.decode_chunk_frames
    )
    assert multi_chunks > 0, "playlist must contain multi-chunk tracks"
    assert stats["up_n"] == multi_chunks
    assert stats["down_n"] >= multi_chunks
