"""Container round-trip tests + hand-computed bincode v1 byte vectors.

The wire format must byte-match Rust `bincode::serialize` of the reference's
serde structs (reference src/codec.rs:31-69, 774-786; SURVEY.md Q9).  The
golden vectors here are constructed by hand from the bincode v1 spec
(little-endian, fixint, u64 Vec lengths, 1-byte Option tag).
"""

import struct

import numpy as np
import pytest

from glc_tpu.container.schema import (
    PAIR_DTYPE,
    AudioHeader,
    EncodedAudio,
    EncodedFrame,
    FrameSet,
    GaplessInfo,
)
from glc_tpu.container.bincode import (
    BincodeError,
    deserialize_encoded,
    serialize_encoded,
)


def make_pairs(items):
    arr = np.empty(len(items), PAIR_DTYPE)
    for i, (k, q) in enumerate(items):
        arr[i] = (k, q)
    return arr


def test_golden_bytes_compressed_frame():
    """One mono compressed frame with two coefficients — exact bytes."""
    frame = EncodedFrame(
        sparse_coeffs_per_channel=[make_pairs([(3, -7), (100, 1234)])],
        scale_factors=np.array([0.5], np.float32),
    )
    enc = EncodedAudio.from_frames(
        AudioHeader(44100, 1, 1000),
        [frame],
        GaplessInfo(512, 72, 1000),
    )
    got = serialize_encoded(enc)

    expected = b"".join([
        struct.pack("<IHQ", 44100, 1, 1000),      # AudioHeader
        struct.pack("<Q", 1),                      # frames vec len
        struct.pack("<Q", 1),                      # sparse outer vec len (1 ch)
        struct.pack("<Q", 2),                      # channel 0: 2 pairs
        struct.pack("<Hh", 3, -7),
        struct.pack("<Hh", 100, 1234),
        struct.pack("<Q", 1),                      # scale_factors len
        struct.pack("<f", 0.5),
        b"\x00",                                   # Option::None
        struct.pack("<IIQ", 512, 72, 1000),        # GaplessInfo
    ])
    assert got == expected


def test_golden_bytes_raw_frame():
    """One stereo raw-PCM frame — exact bytes (frame_size=2 for brevity)."""
    raw = np.array([10, -20, 30, -40], np.int16)  # frame_size*C = 2*2
    frame = EncodedFrame(raw_pcm=raw)
    enc = EncodedAudio.from_frames(
        AudioHeader(48000, 2, 8),
        [frame],
        GaplessInfo(512, 0, 8),
        frame_size=2,
    )
    got = serialize_encoded(enc)

    expected = b"".join([
        struct.pack("<IHQ", 48000, 2, 8),
        struct.pack("<Q", 1),           # frames
        struct.pack("<Q", 0),           # empty sparse outer vec
        struct.pack("<Q", 0),           # empty scale_factors
        b"\x01",                        # Option::Some
        struct.pack("<Q", 4),           # raw vec len
        struct.pack("<4h", 10, -20, 30, -40),
        struct.pack("<IIQ", 512, 0, 8),
    ])
    assert got == expected


def test_round_trip_mixed_frames():
    rng = np.random.default_rng(0)
    C = 2
    frames = []
    for fi in range(57):
        if fi % 5 == 3:
            frames.append(
                EncodedFrame(
                    raw_pcm=rng.integers(-32768, 32767, 2048 * C).astype(np.int16)
                )
            )
        else:
            per_ch = []
            for c in range(C):
                nnz = int(rng.integers(0, 40))
                ks = np.sort(
                    rng.choice(1024, size=nnz, replace=False).astype(np.uint16)
                )
                qs = rng.integers(-32768, 32767, nnz).astype(np.int16)
                qs[qs == 0] = 1
                per_ch.append(make_pairs(list(zip(ks.tolist(), qs.tolist()))))
            frames.append(
                EncodedFrame(
                    sparse_coeffs_per_channel=per_ch,
                    scale_factors=rng.random(C).astype(np.float32),
                )
            )
    enc = EncodedAudio.from_frames(
        AudioHeader(44100, C, 123456), frames, GaplessInfo(512, 100, 123456)
    )
    data = serialize_encoded(enc)
    dec = deserialize_encoded(data)

    assert dec.header.sample_rate == 44100
    assert dec.header.channels == C
    assert dec.header.total_samples == 123456
    assert dec.gapless_info.encoder_delay == 512
    assert dec.gapless_info.padding == 100
    assert len(dec.frames) == 57
    for orig, got in zip(frames, dec.frames):
        assert orig.is_raw == got.is_raw
        if orig.is_raw:
            np.testing.assert_array_equal(orig.raw_pcm, got.raw_pcm)
        else:
            np.testing.assert_array_equal(orig.scale_factors, got.scale_factors)
            for a, b in zip(orig.sparse_coeffs_per_channel,
                            got.sparse_coeffs_per_channel):
                np.testing.assert_array_equal(a, b)
    # Re-serialization is byte-identical
    assert serialize_encoded(dec) == data


def test_empty_frames():
    enc = EncodedAudio(
        AudioHeader(44100, 1, 0),
        FrameSet.empty(1),
        GaplessInfo(512, 0, 0),
    )
    data = serialize_encoded(enc)
    dec = deserialize_encoded(data)
    assert len(dec.frames) == 0
    assert serialize_encoded(dec) == data


def test_truncated_data_raises():
    enc = EncodedAudio.from_frames(
        AudioHeader(44100, 1, 10),
        [EncodedFrame(
            sparse_coeffs_per_channel=[make_pairs([(1, 2)])],
            scale_factors=np.array([1.0], np.float32),
        )],
        GaplessInfo(512, 0, 10),
    )
    data = serialize_encoded(enc)
    for cut in (5, 20, len(data) - 1):
        with pytest.raises(BincodeError):
            deserialize_encoded(data[:cut])


def test_zero_nnz_channel():
    """A compressed frame may legitimately have zero kept coefficients."""
    frame = EncodedFrame(
        sparse_coeffs_per_channel=[np.empty(0, PAIR_DTYPE)],
        scale_factors=np.array([1e-10], np.float32),
    )
    enc = EncodedAudio.from_frames(
        AudioHeader(44100, 1, 100), [frame], GaplessInfo(512, 0, 100)
    )
    dec = deserialize_encoded(serialize_encoded(enc))
    assert len(dec.frames[0].sparse_coeffs_per_channel[0]) == 0


def test_native_and_numpy_paths_byte_identical():
    """The native C++ writer/parser and the numpy fallback must agree."""
    from glc_tpu.container import bincode as bc
    from glc_tpu.native import get_native

    assert get_native() is not None
    rng = np.random.default_rng(7)
    C = 2
    frames = []
    for fi in range(23):
        if fi % 4 == 1:
            frames.append(EncodedFrame(
                raw_pcm=rng.integers(-32768, 32767, 2048 * C).astype(np.int16)
            ))
        else:
            per_ch = []
            for _ in range(C):
                nnz = int(rng.integers(0, 30))
                ks = np.sort(rng.choice(1024, nnz, replace=False)).astype(np.uint16)
                qs = rng.integers(1, 3000, nnz).astype(np.int16)
                per_ch.append(make_pairs(list(zip(ks.tolist(), qs.tolist()))))
            frames.append(EncodedFrame(
                sparse_coeffs_per_channel=per_ch,
                scale_factors=rng.random(C).astype(np.float32),
            ))
    enc = EncodedAudio.from_frames(
        AudioHeader(48000, C, 999), frames, GaplessInfo(512, 1, 999)
    )
    native_bytes = bc._native_serialize(enc)
    numpy_bytes = bc._serialize_encoded_numpy(enc)
    assert native_bytes == numpy_bytes

    a = bc._native_deserialize(native_bytes)
    b = bc._deserialize_encoded_numpy(native_bytes)
    assert bc._serialize_encoded_numpy(a) == bc._serialize_encoded_numpy(b)


def test_trailing_bytes_tolerated():
    """bincode v1's legacy deserialize allows trailing bytes after the
    payload (codec.rs:781-786); both parsers must too."""
    from glc_tpu.container import bincode as bc

    enc = EncodedAudio.from_frames(
        AudioHeader(44100, 1, 10),
        [EncodedFrame(
            sparse_coeffs_per_channel=[make_pairs([(1, 2)])],
            scale_factors=np.array([1.0], np.float32),
        )],
        GaplessInfo(512, 0, 10),
    )
    data = serialize_encoded(enc) + b"\x00trailing-junk"
    for parse in (bc._native_deserialize, bc._deserialize_encoded_numpy):
        dec = parse(data)
        assert dec.gapless_info.encoder_delay == 512
        assert len(dec.frames) == 1


def test_negative_index_out_of_range_raises():
    enc = EncodedAudio.from_frames(
        AudioHeader(44100, 1, 10),
        [EncodedFrame(
            sparse_coeffs_per_channel=[make_pairs([(1, 2)])],
            scale_factors=np.array([1.0], np.float32),
        )],
        GaplessInfo(512, 0, 10),
    )
    assert enc.frames[-1].scale_factors[0] == 1.0
    with pytest.raises(IndexError):
        enc.frames[-2]
    with pytest.raises(IndexError):
        enc.frames[1]
