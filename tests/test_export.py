"""Codec → file-export round trips (mirrors reference tests/test_export.rs)
plus WAV reader/writer coverage (the hound-equivalent layer)."""

import numpy as np
import pytest

from glc_tpu import Decoder, Encoder
from glc_tpu.io.audio import (
    AudioFormatError,
    export_to_flac,
    export_to_wav,
    load_audio_file_lossless,
)
from glc_tpu.io.wav import read_wav, write_wav
from utils import generate_sine_wave


def encode_decode(samples, rate, channels):
    encoded = Encoder(rate).encode(samples, channels)
    return Decoder(channels, rate).decode(encoded)


@pytest.mark.parametrize("export,ext", [(export_to_wav, "wav"),
                                        (export_to_flac, "flac")])
def test_decode_export_reload(tmp_path, export, ext):
    """test_export.rs:20-108 — decode, export, reload: rate/channels/count
    preserved."""
    samples = generate_sine_wave(440.0, 44100, 2, 1.0)
    decoded = encode_decode(samples, 44100, 2)
    out = tmp_path / f"out.{ext}"
    export(out, decoded, 44100, 2)
    reloaded, rate, channels = load_audio_file_lossless(out)
    assert rate == 44100
    assert channels == 2
    assert len(reloaded) == len(decoded)


def test_gapless_playlist_concat_export(tmp_path):
    """test_export.rs:110-166 — 3-file playlist decoded and concatenated into
    one gapless export preserves the exact total sample count."""
    files = [
        generate_sine_wave(440.0, 44100, 1, 1.0),
        generate_sine_wave(880.0, 44100, 1, 1.0),
        generate_sine_wave(660.0, 44100, 1, 1.0),
    ]
    all_samples = np.concatenate([encode_decode(f, 44100, 1) for f in files])
    assert len(all_samples) == sum(len(f) for f in files)

    out = tmp_path / "album.flac"
    export_to_flac(out, all_samples, 44100, 1)
    reloaded, rate, channels = load_audio_file_lossless(out)
    assert rate == 44100 and channels == 1
    assert len(reloaded) == len(all_samples)


def test_wav_int16_round_trip(tmp_path):
    samples = generate_sine_wave(1000.0, 48000, 2, 0.25)
    p = tmp_path / "t.wav"
    write_wav(p, samples, 48000, 2)
    loaded, rate, channels = read_wav(p)
    assert (rate, channels) == (48000, 2)
    assert len(loaded) == len(samples)
    # 16-bit floor: write truncates ×32767 (audio.rs:14), read divides by
    # 32768 (audio.rs:55) — max error ≈ 2/32768
    assert float(np.abs(loaded - samples).max()) < 2.2 / 32768


def test_wav_float32_passthrough(tmp_path):
    """Float WAVs pass through unscaled (audio.rs:46-50)."""
    import struct
    samples = np.array([0.0, 0.5, -0.5, 1.0], np.float32)
    payload = samples.astype("<f4").tobytes()
    header = b"".join([
        b"RIFF", struct.pack("<I", 36 + len(payload)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 3, 1, 44100, 44100 * 4, 4, 32),
        b"data", struct.pack("<I", len(payload)),
    ])
    p = tmp_path / "f32.wav"
    p.write_bytes(header + payload)
    loaded, rate, channels = read_wav(p)
    np.testing.assert_array_equal(loaded, samples)


def test_wav_24bit(tmp_path):
    import struct
    vals = np.array([0, 1 << 22, -(1 << 22), (1 << 23) - 1], np.int32)
    b = np.zeros((len(vals), 3), np.uint8)
    b[:, 0] = vals & 0xFF
    b[:, 1] = (vals >> 8) & 0xFF
    b[:, 2] = (vals >> 16) & 0xFF
    payload = b.tobytes()
    header = b"".join([
        b"RIFF", struct.pack("<I", 36 + len(payload)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, 1, 44100, 44100 * 3, 3, 24),
        b"data", struct.pack("<I", len(payload)),
    ])
    p = tmp_path / "i24.wav"
    p.write_bytes(header + payload)
    loaded, _, _ = read_wav(p)
    np.testing.assert_allclose(loaded, vals / float(1 << 23), atol=1e-7)


def test_unsupported_extension(tmp_path):
    p = tmp_path / "t.mp3"
    p.write_bytes(b"junk")
    with pytest.raises(AudioFormatError):
        load_audio_file_lossless(p)


def test_no_extension(tmp_path):
    p = tmp_path / "noext"
    p.write_bytes(b"junk")
    with pytest.raises(AudioFormatError):
        load_audio_file_lossless(p)


def test_album_playlist_export(tmp_path):
    """Library-level gapless album join (glc_tpu.album; ui.rs:291-402)."""
    from glc_tpu.album import decode_playlist, export_playlist_to_flac
    from glc_tpu import Encoder, save_encoded
    from glc_tpu.flac.decoder import read_flac

    paths = []
    total = 0
    for i, freq in enumerate((440.0, 880.0)):
        s = generate_sine_wave(freq, 44100, 1, 0.7)
        total += len(s)
        p = tmp_path / f"t{i}.glc"
        save_encoded(Encoder(44100).encode(s, 1), p)
        paths.append(p)

    samples, rate, channels = decode_playlist(paths)
    assert (rate, channels) == (44100, 1)
    assert len(samples) == total

    out = tmp_path / "album.flac"
    export_playlist_to_flac(paths, out, 5)
    reloaded, r, c = read_flac(out)
    assert len(reloaded) == total


def test_album_mismatched_rates_rejected(tmp_path):
    from glc_tpu.album import decode_playlist
    from glc_tpu import Encoder, save_encoded

    p1 = tmp_path / "a.glc"
    p2 = tmp_path / "b.glc"
    save_encoded(Encoder(44100).encode(
        generate_sine_wave(440.0, 44100, 1, 0.5), 1), p1)
    save_encoded(Encoder(48000).encode(
        generate_sine_wave(440.0, 48000, 1, 0.5), 1), p2)
    with pytest.raises(ValueError):
        decode_playlist([p1, p2])


def test_album_empty_playlist_rejected():
    from glc_tpu.album import decode_playlist
    with pytest.raises(ValueError):
        decode_playlist([])
