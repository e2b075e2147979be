"""Benchmark: GLC encode/decode/FLAC-export realtime factors on one chip.

Measures the full pipelines end to end — what `glc song.wav` and
`glc -d song.glc` do minus file I/O — on 44.1 kHz stereo program material:

  * encode: host framing, device window/MDCT/masking/quantization, host
    sparsification, bincode container serialization;
  * decode: container → device IMDCT/window/overlap-add → gapless trim (the
    decode anchor of reference tests/test_performance.rs:204-236);
  * flac_export: decode + full FLAC encode at level 5 (reference
    tests/test_performance.rs round-trip anchor).

The reference publishes no numbers (SURVEY.md §6); the north star is ≥500×
realtime encode per chip (BASELINE.json).  `vs_baseline` is measured against
that 500× target for every metric.

Prints one JSON line per metric (encode first — the headline number):
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Each JSON line also carries "median_value" (min-of-5 is the official value —
the 1-core VM is noisy — but the median shows typical behavior).  Stderr
carries diagnostics, including the measured host→device link bandwidth and
the link-bound ceiling it implies for the encode path: with compute ~679×
realtime on-chip, the upload of the source PCM is the physical floor off-chip,
so the e2e number should be judged against that ceiling, not just 500×.
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


def timed(fn, runs: int = 5):
    """(best_seconds, median_seconds, last_result) over `runs` timed calls."""
    times = []
    result = None
    for _ in range(runs):
        t0 = time.perf_counter()
        result = fn()
        times.append(time.perf_counter() - t0)
    return min(times), float(np.median(times)), result


def emit(metric: str, duration_s: float, best: float, med: float, **extra):
    rt = duration_s / best
    line = {
        "metric": metric,
        "value": round(rt, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rt / 500.0, 3),
        "median_value": round(duration_s / med, 1),
    }
    line.update(extra)
    print(json.dumps(line))
    sys.stdout.flush()


def main() -> None:
    duration_s = 60.0
    sample_rate = 44100
    # 16-bit-sourced program material (what a WAV/FLAC input actually is):
    # the encoder's exact i16 fast path applies, as it does for `glc x.wav`
    samples_f32 = make_signal(duration_s, sample_rate)
    samples = np.clip(samples_f32 * 32767.0, -32768, 32767).astype(np.int16)

    import jax

    from glc_tpu import Decoder, Encoder, serialize_encoded
    from glc_tpu.flac.encoder import (
        encode_flac_i16_streaming,
        encode_flac_i16_with_level,
    )

    enc = Encoder(sample_rate)
    dec = Decoder(2, sample_rate)

    # Warmup: compile + caches for all three pipelines
    encoded = enc.encode_pcm16(samples, 2)
    data = serialize_encoded(encoded)
    pcm = dec.decode_i16(encoded)
    flac_bytes = encode_flac_i16_with_level(pcm, sample_rate, 2, 5)

    # --- link bandwidth + encode ceiling (judge e2e against physics) ---
    upload_bytes = samples.nbytes  # the i16 PCM is the irreducible upload
    probe = jax.device_put(samples)
    jax.block_until_ready(probe)
    bw_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(samples))
        bw_times.append(time.perf_counter() - t0)
    link_bw = upload_bytes / min(bw_times)  # bytes/s, best case
    encode_ceiling = duration_s / (upload_bytes / link_bw)

    # --- encode ---
    best, med, _ = timed(
        lambda: serialize_encoded(enc.encode_pcm16(samples, 2))
    )
    emit(
        "encode_realtime_factor_44k_stereo", duration_s, best, med,
        link_ceiling_x_realtime=round(encode_ceiling, 1),
        pct_of_link_ceiling=round(100.0 * (duration_s / best) / encode_ceiling, 1),
    )
    print(
        f"# encode {duration_s:.0f}s stereo in {best*1000:.1f} ms "
        f"(median {med*1000:.1f} ms over 5 runs), "
        f"container {len(data)} bytes ({len(samples)*4/len(data):.1f}x vs f32)",
        file=sys.stderr,
    )
    print(
        f"# host->device link: {link_bw/1e6:.1f} MB/s best over 5 probes; "
        f"{upload_bytes/1e6:.1f} MB PCM upload -> encode ceiling "
        f"{encode_ceiling:.0f}x realtime (e2e is "
        f"{100.0*(duration_s/best)/encode_ceiling:.0f}% of ceiling)",
        file=sys.stderr,
    )

    # --- decode (decode_i16, the export path) ---
    best_d, med_d, pcm = timed(lambda: dec.decode_i16(encoded))
    emit("decode_realtime_factor_44k_stereo", duration_s, best_d, med_d)
    print(
        f"# decode {duration_s:.0f}s stereo in {best_d*1000:.1f} ms "
        f"(median {med_d*1000:.1f} ms), {len(pcm)} samples",
        file=sys.stderr,
    )

    # --- FLAC export (decode + FLAC encode level 5, the `glc -d` default:
    # streamed, so host FLAC math overlaps the decode's transfers) ---
    n_total = dec.decoded_length(encoded)
    best_f, med_f, flac_bytes = timed(
        lambda: encode_flac_i16_streaming(
            dec.decode_i16_stream(encoded), sample_rate, 2, 5, n_total // 2
        )
    )
    emit("flac_export_realtime_factor_44k_stereo", duration_s, best_f, med_f)
    print(
        f"# decode+flac(level 5) {duration_s:.0f}s stereo in "
        f"{best_f*1000:.1f} ms (median {med_f*1000:.1f} ms), "
        f"{len(flac_bytes)} bytes",
        file=sys.stderr,
    )

    # --- album encode (pipelined multi-file: upload of file i+1 overlaps
    # compute+download of file i) ---
    track = np.clip(
        make_signal(15.0, sample_rate) * 32767.0, -32768, 32767
    ).astype(np.int16)
    tracks = [(track, 2)] * 4  # 4 × 15 s = the same 60 s of audio
    enc.encode_many(tracks)  # warmup (same bucket as 15 s singles)
    best_a, med_a, _ = timed(
        lambda: [serialize_encoded(e) for e in enc.encode_many(tracks)]
    )
    emit("album_encode_realtime_factor_44k_stereo", duration_s, best_a, med_a)
    best_s, med_s, _ = timed(
        lambda: [serialize_encoded(enc.encode_pcm16(t, c))
                 for t, c in tracks]
    )
    print(
        f"# album 4x15s stereo: pipelined {best_a*1000:.1f} ms vs serial "
        f"{best_s*1000:.1f} ms ({best_s/best_a:.2f}x)",
        file=sys.stderr,
    )

    # --- diagnostics: device-compute-only realtime factor + compaction path ---
    try:
        from glc_tpu.codec.encoder import frame_signal
        from glc_tpu.ops.encode import encode_signal_device

        fs = encoded.frame_set
        max_row_nnz = int(fs.nnz.max()) if fs.nnz.size else 0
        print(
            f"# compaction: max per-(frame,channel) nnz = {max_row_nnz} "
            f"(sort-free cumsum+scatter path)",
            file=sys.stderr,
        )

        tb = enc._tables
        tables = (tb.cos_table, tb.window, tb.norm, tb.band_mask,
                  tb.band_inv_count, tb.band_pf, tb.band_of, tb.inv_w)
        padded, F, _, _ = frame_signal(samples, 2, enc.config, np.int16)
        seg = np.zeros((2, 4097 * 1024), np.int16)
        seg[:, : padded.shape[1]] = padded[:, : 4097 * 1024]
        budget = 4096 * 2 * 1024 // 8
        # Identical (program, args) dispatches get memoized somewhere in the
        # relay chain (measured: 0.04 ms "runs" of an 88 ms program), so
        # force real execution: distinct resident inputs, and a 1-element
        # download per call that the whole chain must produce.
        variants = []
        for i in range(8):
            s = seg.copy()
            s[0, i] += 1
            variants.append(jax.device_put(s))
        jax.block_until_ready(variants)
        run = lambda s: encode_signal_device(
            s, np.int32(0), *tables, k_frames=4096, budget=budget,
            pcm16=True)
        np.asarray(run(variants[0])[:1])  # compile
        t0 = time.perf_counter()
        sums = [run(s)[:1] for s in variants]
        for s in sums:
            np.asarray(s)
        dt = (time.perf_counter() - t0) / len(variants)
        print(
            json.dumps(
                {
                    "metric": "encode_device_compute_realtime_factor_44k_stereo",
                    "value": round(duration_s / dt, 1),
                    "unit": "x_realtime",
                    "vs_baseline": round(duration_s / dt / 500.0, 3),
                }
            )
        )
        print(
            f"# device-compute-only (forced, incl. dispatch+1-int download):"
            f" {dt*1000:.2f} ms for {duration_s:.0f}s "
            f"stereo = {duration_s/dt:.0f}x realtime on-chip",
            file=sys.stderr,
        )

        # decode device-compute: resident packed uploads, forced execution
        from glc_tpu.codec.decoder import _packed_slices
        from glc_tpu.codec.tables import chunk_size_for
        from glc_tpu.ops.decode import decode_chunk_packed_device

        fs = encoded.frame_set
        F = fs.num_frames
        chunk = chunk_size_for(F, enc.config.decode_chunk_frames)
        words, raw_words, budget2, rbudget = _packed_slices(
            fs, 0, min(F, chunk), chunk, 1024, True
        )
        carries = []
        for i in range(8):
            w = words.copy()
            w[-1 - i] ^= 1  # perturb an is_raw pad slot (unused) per variant
            carries.append(jax.device_put(w))
        jax.block_until_ready(carries)
        raw_d = jax.device_put(raw_words if raw_words is not None
                               else np.empty(0, np.int32))
        zero_carry = jax.device_put(np.zeros((2, 1024), np.float32))

        def drun(w):
            return decode_chunk_packed_device(
                w, raw_d, zero_carry, np.int32(min(F, chunk)),
                tb.cos_table, tb.window, tb.norm,
                K=chunk, C=2, n=1024, budget=budget2, rbudget=rbudget,
                max_q=enc.config.max_q, window_raw=False, out_i16=True,
            )

        np.asarray(drun(carries[0])[0][:1])
        t0 = time.perf_counter()
        outs = [drun(w)[0][:1] for w in carries]
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / len(carries)
        print(
            f"# decode device-compute-only (forced): {dt*1000:.2f} ms for "
            f"{duration_s:.0f}s stereo = {duration_s/dt:.0f}x realtime "
            f"on-chip",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"# diagnostics failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
