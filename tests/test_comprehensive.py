"""Waveform × frequency × rate × channels matrix
(mirrors reference tests/test_comprehensive.rs)."""

import numpy as np
import pytest

from glc_tpu import Decoder, Encoder
from utils import (
    calculate_snr,
    generate_frequency_sweep,
    generate_sawtooth_wave,
    generate_sine_wave,
    generate_square_wave,
)


def run_single_test(samples, sample_rate, channels):
    """test_comprehensive.rs:7-21"""
    encoded = Encoder(sample_rate).encode(samples, channels)
    decoded = Decoder(channels, sample_rate).decode(encoded)
    return calculate_snr(samples, decoded), len(decoded)


SINE_CASES = [
    # (freq, rate, channels, duration, snr_floor) — test_comprehensive.rs:23-190
    (100.0, 44100, 1, 4.0, -10.0),
    (440.0, 44100, 1, 4.0, -10.0),
    (1000.0, 44100, 1, 4.0, -10.0),
    (2000.0, 44100, 1, 4.0, -10.0),
    (4000.0, 44100, 1, 4.0, -10.0),
    (440.0, 48000, 1, 5.0, -10.0),
    (440.0, 44100, 2, 5.0, -10.0),
    (440.0, 44100, 1, 1.0, -10.0),
    (440.0, 44100, 1, 10.0, -10.0),
]


@pytest.mark.parametrize("freq,rate,ch,dur,floor", SINE_CASES)
def test_sine_matrix(freq, rate, ch, dur, floor):
    samples = generate_sine_wave(freq, rate, ch, dur)
    snr, n = run_single_test(samples, rate, ch)
    assert snr > floor, f"SNR too low: {snr} dB"
    assert n == len(samples)


@pytest.mark.parametrize("freq,rate,ch,dur,floor", [
    (440.0, 44100, 1, 5.0, -15.0),
    (1000.0, 48000, 2, 4.0, -15.0),
])
def test_square_matrix(freq, rate, ch, dur, floor):
    samples = generate_square_wave(freq, rate, ch, dur)
    snr, n = run_single_test(samples, rate, ch)
    assert snr > floor, f"SNR too low: {snr} dB"
    assert n == len(samples)


def test_sawtooth_440hz_44k_mono():
    samples = generate_sawtooth_wave(440.0, 44100, 1, 5.0)
    snr, n = run_single_test(samples, 44100, 1)
    assert snr > -15.0, f"SNR too low: {snr} dB"
    assert n == len(samples)


@pytest.mark.parametrize("f0,f1,rate,ch,dur", [
    (100.0, 1000.0, 44100, 1, 6.0),
    (440.0, 2000.0, 44100, 1, 7.0),
    (200.0, 8000.0, 48000, 1, 8.0),
    (1000.0, 100.0, 44100, 1, 6.0),
    (440.0, 880.0, 44100, 2, 6.0),
])
def test_sweep_matrix(f0, f1, rate, ch, dur):
    samples = generate_frequency_sweep(f0, f1, rate, ch, dur)
    snr, n = run_single_test(samples, rate, ch)
    assert snr > -10.0, f"SNR too low: {snr} dB"
    assert n == len(samples)


def test_amplitude_consistency():
    """test_comprehensive.rs:193-230 — RMS amplitude deviation < 5%."""
    samples = generate_sine_wave(440.0, 44100, 1, 2.0)
    encoded = Encoder(44100).encode(samples, 1)
    decoded = Decoder(1, 44100).decode(encoded)

    energy_orig = float(np.mean(np.square(samples, dtype=np.float64)))
    energy_recon = float(np.mean(np.square(decoded, dtype=np.float64)))
    rms_variation = abs(np.sqrt(energy_recon) - np.sqrt(energy_orig)) / np.sqrt(energy_orig)
    assert rms_variation < 0.05, f"Amplitude variation too high: {rms_variation:.4f}"
