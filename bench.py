"""Benchmark: full GLC encode realtime factor on one chip.

Measures the complete encode path — host framing, device window/MDCT/masking/
quantization, host sparsification, and bincode container serialization — on
44.1 kHz stereo program material, end to end (what `glc song.wav` does minus
file I/O).  The reference publishes no numbers (SURVEY.md §6); the north star
is ≥500× realtime per chip (BASELINE.json).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def make_signal(duration_s: float, sample_rate: int = 44100) -> np.ndarray:
    """Stereo program-like material: chord + sweep + noise bed (keeps the
    sparse path honest — pure tones over-flatter the codec)."""
    t = np.arange(int(sample_rate * duration_s), dtype=np.float32) / sample_rate
    left = (
        0.30 * np.sin(2 * np.pi * 261.63 * t)
        + 0.20 * np.sin(2 * np.pi * 329.63 * t)
        + 0.15 * np.sin(2 * np.pi * (440.0 + 100.0 * t) * t)
    )
    rng = np.random.default_rng(1234)
    noise = rng.standard_normal(len(t)).astype(np.float32) * 0.01
    right = left * 0.9 + noise
    out = np.empty(2 * len(t), np.float32)
    out[0::2] = left + noise
    out[1::2] = right
    return out


def main() -> None:
    duration_s = 60.0
    sample_rate = 44100
    # 16-bit-sourced program material (what a WAV/FLAC input actually is):
    # the encoder's exact i16 fast path applies, as it does for `glc x.wav`
    samples_f32 = make_signal(duration_s, sample_rate)
    samples = np.clip(samples_f32 * 32767.0, -32768, 32767).astype(np.int16)

    from glc_tpu import Encoder, serialize_encoded

    enc = Encoder(sample_rate)

    # Warmup: compile + caches
    encoded = enc.encode_pcm16(samples, 2)
    data = serialize_encoded(encoded)

    runs = 5
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        encoded = enc.encode_pcm16(samples, 2)
        data = serialize_encoded(encoded)
        times.append(time.perf_counter() - t0)

    best = min(times)
    rt_factor = duration_s / best

    print(
        json.dumps(
            {
                "metric": "encode_realtime_factor_44k_stereo",
                "value": round(rt_factor, 1),
                "unit": "x_realtime",
                "vs_baseline": round(rt_factor / 500.0, 3),
            }
        )
    )
    print(
        f"# encode {duration_s:.0f}s stereo in {best*1000:.1f} ms "
        f"(median {np.median(times)*1000:.1f} ms over {runs} runs), "
        f"container {len(data)} bytes "
        f"({len(samples)*4/len(data):.1f}x vs f32)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
