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

    # Diagnostic: device-compute-only realtime factor (data resident in
    # HBM, no host link).  Shows the architecture's headroom — off-chip the
    # host↔device link, not the MXU, is the binding constraint.
    try:
        import jax

        from glc_tpu.codec.encoder import frame_signal
        from glc_tpu.ops.encode import encode_signal_device

        tb = enc._tables
        tables = (tb.cos_table, tb.window, tb.norm, tb.band_mask,
                  tb.band_inv_count, tb.band_pf, tb.band_of, tb.inv_w)
        padded, F, _, _ = frame_signal(samples, 2, enc.config, np.int16)
        seg = np.zeros((2, 4097 * 1024), np.int16)
        seg[:, : padded.shape[1]] = padded[:, : 4097 * 1024]
        seg_dev = jax.device_put(seg)
        budget = 4096 * 2 * 1024 // 8
        out = encode_signal_device(seg_dev, *tables, budget=budget,
                                   pcm16=True)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = encode_signal_device(seg_dev, *tables, budget=budget,
                                       pcm16=True)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(
            f"# device-compute-only: {dt*1000:.2f} ms for {duration_s:.0f}s "
            f"stereo = {duration_s/dt:.0f}x realtime on-chip",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"# device-compute-only diagnostic failed: {e}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
