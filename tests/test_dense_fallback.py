"""End-to-end coverage of the encoder's dense-transfer fallback.

The device encode compacts sparse pairs into a fixed budget (12.5% of
coefficient slots).  Content between that budget and the ~83% density where
the raw-PCM fallback trips (the size model of reference src/codec.rs:506-521)
takes a DIFFERENT compiled program (`encode_interleaved_dense_device`), whose
keep-gate can differ by ±1 ulp from the compacting program's — so the
encoder takes nnz/scales/use_raw from the dense program too.  These tests
pin that self-consistency: the fallback actually fires on realistic
dense-but-compressible content, and the container it produces is internally
consistent and round-trips.
"""

import numpy as np
import pytest

import glc_tpu.codec.encoder as encoder_mod
from glc_tpu import Decoder, Encoder, deserialize_encoded, serialize_encoded
from glc_tpu.config import CodecConfig


def bandlimited_noise(duration_s: float, channels: int, frac: float = 0.4,
                      sample_rate: int = 44100, seed: int = 7) -> np.ndarray:
    """White noise lowpassed to `frac` of the spectrum: ~frac kept-coefficient
    density — far above the 12.5% compaction budget, far below the raw-PCM
    trip point."""
    rng = np.random.default_rng(seed)
    T = int(sample_rate * duration_s)
    chans = []
    for _ in range(channels):
        x = rng.standard_normal(T)
        X = np.fft.rfft(x)
        X[int(len(X) * frac):] = 0
        y = np.fft.irfft(X, T)
        chans.append(y / np.abs(y).max() * 0.5)
    out = np.empty(T * channels, np.float32)
    for c, y in enumerate(chans):
        out[c::channels] = y
    return out


@pytest.fixture()
def count_dense_calls(monkeypatch):
    """Wrap the dense-fallback device call with a counter."""
    calls = {"n": 0}
    real = encoder_mod.encode_interleaved_dense_device

    def counting(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(encoder_mod, "encode_interleaved_dense_device", counting)
    return calls


@pytest.mark.parametrize("channels,duration", [(1, 2.0), (2, 1.0)])
def test_dense_fallback_fires_and_roundtrips(channels, duration,
                                             count_dense_calls):
    samples = bandlimited_noise(duration, channels)
    enc = Encoder(44100)
    ea = enc.encode(samples, channels)

    # the fallback branch must actually have run for this content
    assert count_dense_calls["n"] > 0

    fs = ea.frame_set
    # ~40% density: between the 12.5% budget and the ~83% raw trip point
    density = fs.nnz[~fs.raw_mask].mean() / 1024
    assert 0.15 < density < 0.80
    assert not fs.raw_mask.all()

    # container self-consistency: the pair stream is segmented by nnz, raw
    # rows by raw_mask — any desync between the dense program's stats and
    # its pairs would break these invariants
    assert len(fs.pairs) == int(fs.nnz.sum())
    assert len(fs.raw_pcm) == int(fs.raw_mask.sum())
    assert (fs.nnz[fs.raw_mask] == 0).all()
    assert (fs.scales > 0).all()

    # bincode round-trip is byte-stable
    data = serialize_encoded(ea)
    ea2 = deserialize_encoded(data)
    assert serialize_encoded(ea2) == data

    # decode: exact length, sane reconstruction (skip edge transients).
    # Quality is judged in clean mode — reference_compat reproduces quirk Q1,
    # whose stereo trim shift makes a direct sample comparison meaningless.
    out = Decoder(channels, 44100).decode(ea2)
    assert len(out) == len(samples)
    clean = CodecConfig(reference_compat=False)
    ea_clean = Encoder(44100, config=clean).encode(samples, channels)
    out_clean = Decoder(channels, 44100, config=clean).decode(ea_clean)
    assert len(out_clean) == len(samples)
    a, b = samples[1000:-1000], out_clean[1000:-1000]
    err = np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(a ** 2))
    assert err < 0.5, f"relative RMS error {err:.3f}"


def test_dense_fallback_deterministic(count_dense_calls):
    """Two encodes of the same dense content produce identical containers
    (the fallback path is as pure as the compacting path)."""
    samples = bandlimited_noise(1.0, 1)
    enc = Encoder(44100)
    d1 = serialize_encoded(enc.encode(samples, 1))
    d2 = serialize_encoded(enc.encode(samples, 1))
    assert count_dense_calls["n"] >= 2
    assert d1 == d2


def test_dense_fallback_matches_sparse_path_when_budget_allows():
    """The same signal encoded through a segment plan whose budget is not
    exceeded (shorter file → higher budget-to-content ratio) must agree
    with the dense-path container on the frames they share — the two
    programs implement one spec (codec.rs:462-541)."""
    # 0.25 s at 40%: F≈10 frames, budget floor 16384 pairs > ~4.3k kept →
    # compacting path; same frames inside the 2 s file go through the dense
    # path.  The short signal is a PREFIX of the long one (bandlimiting is
    # length-dependent, so slice rather than regenerate) — frame 0 sees
    # identical samples in both.
    long = bandlimited_noise(2.0, 1)
    short = long[: int(44100 * 0.25)].copy()

    enc = Encoder(44100)
    ea_s = enc.encode(short, 1)
    ea_l = enc.encode(long, 1)
    fs_s, fs_l = ea_s.frame_set, ea_l.frame_set

    # frame 4 lies fully inside the shared prefix (its 2048-sample window
    # ends at sample 4·1024+1536 < 11025): same windowed input, so stats and
    # pairs must agree up to the ±1 ulp keep-gate tolerance
    f = 4
    n_s, n_l = int(fs_s.nnz[f, 0]), int(fs_l.nnz[f, 0])
    assert n_s > 100  # genuinely dense content in this frame
    assert abs(n_s - n_l) <= 2
    assert fs_s.scales[f, 0] == fs_l.scales[f, 0]
    off_s = int(fs_s.nnz[:f].sum())
    off_l = int(fs_l.nnz[:f].sum())
    m = min(n_s, n_l)
    ps = fs_s.pairs[off_s : off_s + m]
    pl = fs_l.pairs[off_l : off_l + m]
    same = (ps["k"] == pl["k"]) & (ps["q"] == pl["q"])
    assert same.mean() > 0.99
