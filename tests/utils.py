"""Shared test utilities: waveform generation and SNR analysis.

Reimplements the reference's deterministic generators with identical math
(reference tests/utils.rs), including the Numerical-Recipes LCG for white
noise, so signals match the reference test suite sample-for-sample (up to f32
libm rounding).
"""

import numpy as np

_PI = np.float32(np.pi)


def generate_sine_wave(frequency, sample_rate, channels, duration_seconds):
    """tests/utils.rs:5-22"""
    total = int(np.float32(sample_rate) * np.float32(duration_seconds))
    t = np.arange(total, dtype=np.float32) / np.float32(sample_rate)
    s = np.sin(
        (np.float32(2.0) * _PI * np.float32(frequency) * t).astype(np.float64)
    ).astype(np.float32) * np.float32(0.5)
    return np.repeat(s, channels).astype(np.float32)


def generate_square_wave(frequency, sample_rate, channels, duration_seconds):
    """tests/utils.rs:25-43"""
    total = int(np.float32(sample_rate) * np.float32(duration_seconds))
    t = np.arange(total, dtype=np.float32) / np.float32(sample_rate)
    phase = np.float32(2.0) * _PI * np.float32(frequency) * t
    s = np.where(
        np.sin(phase.astype(np.float64)).astype(np.float32) >= 0.0,
        np.float32(0.3),
        np.float32(-0.3),
    )
    return np.repeat(s, channels).astype(np.float32)


def generate_sawtooth_wave(frequency, sample_rate, channels, duration_seconds):
    """tests/utils.rs:46-64"""
    total = int(np.float32(sample_rate) * np.float32(duration_seconds))
    t = np.arange(total, dtype=np.float32) / np.float32(sample_rate)
    phase = np.float32(2.0) * _PI * np.float32(frequency) * t
    phase = np.mod(phase, np.float32(2.0) * _PI)
    s = ((phase / _PI) - np.float32(1.0)) * np.float32(0.3)
    return np.repeat(s, channels).astype(np.float32)


def generate_frequency_sweep(start_freq, end_freq, sample_rate, channels,
                             duration_seconds):
    """tests/utils.rs:67-86"""
    total = int(np.float32(sample_rate) * np.float32(duration_seconds))
    t = np.arange(total, dtype=np.float32) / np.float32(sample_rate)
    progress = t / np.float32(duration_seconds)
    freq = np.float32(start_freq) + (
        np.float32(end_freq) - np.float32(start_freq)
    ) * progress
    s = np.sin(
        (np.float32(2.0) * _PI * freq * t).astype(np.float64)
    ).astype(np.float32) * np.float32(0.3)
    return np.repeat(s, channels).astype(np.float32)


def generate_white_noise(sample_rate, channels, duration_seconds, seed):
    """tests/utils.rs:89-114 — Numerical Recipes LCG, identical sequence."""
    total = int(np.float32(sample_rate) * np.float32(duration_seconds))
    count = total * channels
    out = np.empty(count, np.float32)
    state = np.uint64(seed)
    a = np.uint64(1664525)
    c = np.uint64(1013904223)
    umax = np.float32(np.uint64(0xFFFFFFFFFFFFFFFF))
    # LCG is inherently sequential; generate the u64 sequence with a scan.
    states = np.empty(count, np.uint64)
    with np.errstate(over="ignore"):
        for i in range(count):
            state = state * a + c
            states[i] = state
    normalized = states.astype(np.float32) / umax
    out = (normalized - np.float32(0.5)) * np.float32(0.6)
    return out.astype(np.float32)


def calculate_snr(original, decoded):
    """tests/utils.rs:118-147 — skips 1000-sample edge transients."""
    original = np.asarray(original, np.float32)
    decoded = np.asarray(decoded, np.float32)
    min_len = min(len(original), len(decoded))
    if min_len < 2000:
        return 0.0
    o = original[1000 : min_len - 1000].astype(np.float64)
    d = decoded[1000 : min_len - 1000].astype(np.float64)
    err = o - d
    signal_power = float(np.sum(o * o))
    noise_power = float(np.sum(err * err))
    if noise_power > 0.0 and signal_power > 0.0:
        return 10.0 * np.log10(signal_power / noise_power)
    return float("inf") if noise_power == 0.0 else 0.0


def calculate_snr_range(original, decoded, start_idx, end_idx):
    """tests/utils.rs:150-173"""
    o = np.asarray(original, np.float64)[start_idx:end_idx]
    d = np.asarray(decoded, np.float64)[start_idx:end_idx]
    err = o - d
    signal_power = float(np.sum(o * o))
    noise_power = float(np.sum(err * err))
    if noise_power > 0.0 and signal_power > 0.0:
        return 10.0 * np.log10(signal_power / noise_power)
    return float("inf") if noise_power == 0.0 else 0.0
