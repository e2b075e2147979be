"""Benchmark: GLC encode/decode/FLAC-export realtime factors on one chip.

Measures the full pipelines end to end — what `glc song.wav` and
`glc -d song.glc` do minus file I/O — on 44.1 kHz stereo program material:

  * encode: host framing, device window/MDCT/masking/quantization, host
    sparsification, bincode container serialization;
  * decode: container → device IMDCT/window/overlap-add → gapless trim (the
    decode anchor of reference tests/test_performance.rs:204-236);
  * flac_export: decode + full FLAC encode at level 5 (reference
    tests/test_performance.rs round-trip anchor);
  * album: 4×15 s multi-track encode_many (batched device program) vs the
    serial per-file loop it replaces (reference src/main.rs:545-583).

The reference publishes no numbers (SURVEY.md §6); the north star is ≥500×
realtime encode per chip (BASELINE.json).  `vs_baseline` is measured against
that 500× target for every metric.

Link-ceiling attribution: the host↔device relay in this environment swings
18-70 MB/s between runs and is HALF-DUPLEX with asymmetric directions, so a
ceiling probed once is meaningless for a run made seconds later.  Every
timed pipeline run is therefore paired with an ADJACENT bandwidth probe of
the same transfer direction(s); each metric's official
`pct_of_link_ceiling` is the MEDIAN over runs of (achieved / own-probe
ceiling) — the best single pairing is also reported but is noisy in both
directions (a probe that under-reads the link its run actually got shows
>100%).  Ceiling bytes per metric:

  * encode: the irreducible i16 PCM upload (samples.nbytes) + the encoded
    container's bytes coming back down (the sparse pairs/stats must cross
    the link to be serialized — same both-directions accounting as the
    decode/flac lines);
  * decode: the packed container upload + the i16 PCM download;
  * flac_export: same transfers as decode (FLAC math is host work that
    overlaps them).

Prints one JSON line per metric (encode first — the headline number):
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Each JSON line carries "median_value" (min-of-N is the official value — the
1-core VM is noisy — but the median shows typical behavior) plus the ceiling
fields.  Stderr carries diagnostics: per-stage encode attribution (upload /
device / download+assemble / serialize), the album serial comparator, a
10-minute multi-segment long-file run, and forced-execution device-compute
factors.
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



def _ceiling_fields(times, ceils, duration_s):
    """Ceiling JSON fields for one metric: the official
    `pct_of_link_ceiling` is the MEDIAN of per-run (achieved / own-probe
    ceiling) ratios — pairing only the best run's time with its single
    adjacent probe is noisy in both directions (a probe that under-reads
    the link the run actually got yields >100%).  The best run's ceiling is
    still reported for context."""
    i = int(np.argmin(times))
    ratios = [100.0 * (duration_s / t) / c for t, c in zip(times, ceils)]
    return dict(
        link_ceiling_x_realtime=round(ceils[i], 1),
        pct_of_link_ceiling=round(float(np.median(ratios)), 1),
        pct_of_link_ceiling_best_run=round(ratios[i], 1),
    )


def main() -> None:
    duration_s = 60.0
    sample_rate = 44100
    # 16-bit-sourced program material (what a WAV/FLAC input actually is):
    # the encoder's exact i16 fast path applies, as it does for `glc x.wav`
    samples_f32 = make_signal(duration_s, sample_rate)
    samples = np.clip(samples_f32 * 32767.0, -32768, 32767).astype(np.int16)

    import jax

    from glc_tpu import Decoder, Encoder, serialize_encoded
    from glc_tpu.flac.encoder import encode_flac_i16_streaming

    enc = Encoder(sample_rate)
    dec = Decoder(2, sample_rate)

    # Warmup: compile + caches for all pipelines
    encoded = enc.encode_pcm16(samples, 2)
    data = serialize_encoded(encoded)
    pcm = dec.decode_i16(encoded)
    n_total = dec.decoded_length(encoded)
    encode_flac_i16_streaming(
        dec.decode_i16_stream(
            encoded, chunk_frames=dec.config.stream_chunk_frames),
        sample_rate, 2, 5, n_total // 2
    )

    up_bytes = samples.nbytes            # irreducible encode upload
    down_bytes = pcm.nbytes              # irreducible decode download
    words_bytes = _decode_upload_bytes(dec, encoded)

    # Probes must defeat caching at every layer: device_put of an unchanged
    # host array and np.asarray of an unchanged device array can both be
    # served from caches (measured: a "10 s" 109 MB upload repeated in
    # 0.08 s), so each probe perturbs a fresh buffer / forces a fresh
    # device computation.
    probe_buf = samples.copy()

    _bump = jax.jit(lambda x, i: x + i)
    probe_dev = jax.device_put(samples)
    jax.block_until_ready(probe_dev)
    _probe_n = [0]

    def probe_up() -> float:
        probe_buf[0] += 1
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(probe_buf))
        return up_bytes / (time.perf_counter() - t0)

    def probe_down() -> float:
        _probe_n[0] += 1                  # distinct args defeat memoization
        src = _bump(probe_dev, np.int16(_probe_n[0]))
        jax.block_until_ready(src)
        t0 = time.perf_counter()
        np.asarray(src)
        return up_bytes / (time.perf_counter() - t0)

    runs = 7

    # --- long file: 10-minute stereo exercises the multi-segment plan,
    # the resident-length ladder, the piecewise resident upload, and the
    # in-flight window.  Runs FIRST, right after warmup: a long session
    # degrades the relay's sustained large-transfer rate (measured 7/7 runs
    # at end-of-bench 22-71x vs 5/5 standalone runs 105-250x; profiler
    # trace shows ~88% of the wall waiting on the 106 MB background upload,
    # jax.clear_caches() recovered it only once) — early placement measures
    # the pipeline under the fresh-session conditions standalone use sees,
    # and the 60 s metrics that follow are unaffected (their buffers are
    # 10x smaller and round-robined). ---
    try:
        long_s = 600.0
        long_pcm = np.clip(
            make_signal(long_s, sample_rate) * 32767.0, -32768, 32767
        ).astype(np.int16)
        t0 = time.perf_counter()
        enc.encode_pcm16(long_pcm, 2)
        warm = time.perf_counter() - t0
        # the relay link swings 18-70 MB/s between runs, so a single hot
        # run can be dominated by a transient stall: take the best of 3,
        # with an adjacent probe per run for attribution
        hots, ceils = [], []
        for _ in range(3):
            bw_l = probe_up()
            t0 = time.perf_counter()
            serialize_encoded(enc.encode_pcm16(long_pcm, 2))
            hots.append(time.perf_counter() - t0)
            ceils.append(long_s / (long_pcm.nbytes / bw_l))
        i_l = int(np.argmin(hots))
        hot = hots[i_l]
        print(
            f"# long file 600s stereo: first {warm*1000:.0f} ms "
            f"(incl. segment-plan compiles), best hot {hot*1000:.0f} ms = "
            f"{long_s/hot:.0f}x realtime = "
            f"{100*(long_s/hot)/ceils[i_l]:.0f}% of its adjacent "
            f"{ceils[i_l]:.0f}x upload ceiling (runs: "
            + " ".join(f"{long_s/h:.0f}x" for h in hots)
            + "; multi-segment, zero recompile)",
            file=sys.stderr,
        )
        del long_pcm
    except Exception as e:
        print(f"# long-file diagnostic failed: {e}", file=sys.stderr)


    # --- timed runs, ROUND-ROBIN across the three pipelines: the relay's
    # bandwidth phases last seconds-to-minutes, so running each metric's N
    # repeats back-to-back lets one slow phase doom one metric while its
    # neighbors look fine (observed: decode 877 ms median in a capture
    # where the same code measures 294-430 ms standalone).  Interleaving
    # spreads any phase across all metrics; the adjacent probes still
    # attribute each run against its own link conditions. ---
    container_bytes = len(data)
    enc_times, enc_ceils = [], []
    dec_times, dec_ceils = [], []
    flac_times, flac_ceils = [], []
    for _ in range(runs):
        bw_u, bw_d = probe_up(), probe_down()
        t0 = time.perf_counter()
        data = serialize_encoded(enc.encode_pcm16(samples, 2))
        dt = time.perf_counter() - t0
        enc_times.append(dt)
        floor_s = up_bytes / bw_u + container_bytes / bw_d
        enc_ceils.append(duration_s / floor_s)

        bw_u, bw_d = probe_up(), probe_down()
        t0 = time.perf_counter()
        pcm = dec.decode_i16(encoded)
        dt = time.perf_counter() - t0
        dec_times.append(dt)
        floor_s = words_bytes / bw_u + down_bytes / bw_d
        dec_ceils.append(duration_s / floor_s)

        bw_u, bw_d = probe_up(), probe_down()
        t0 = time.perf_counter()
        flac_bytes = encode_flac_i16_streaming(
            dec.decode_i16_stream(
            encoded, chunk_frames=dec.config.stream_chunk_frames),
        sample_rate, 2, 5, n_total // 2
        )
        dt = time.perf_counter() - t0
        flac_times.append(dt)
        floor_s = words_bytes / bw_u + down_bytes / bw_d
        flac_ceils.append(duration_s / floor_s)

    best, med = min(enc_times), float(np.median(enc_times))
    emit(
        "encode_realtime_factor_44k_stereo", duration_s, best, med,
        **_ceiling_fields(enc_times, enc_ceils, duration_s),
    )
    print(
        f"# encode {duration_s:.0f}s stereo in {best*1000:.1f} ms "
        f"(median {med*1000:.1f} ms over {runs} runs), "
        f"container {len(data)} bytes ({len(samples)*4/len(data):.1f}x vs f32)",
        file=sys.stderr,
    )
    print(
        f"# encode ceilings per run (adjacent up+down probes; floor = "
        f"{up_bytes/1e6:.1f} MB PCM up + {container_bytes/1e6:.2f} MB "
        f"container down): "
        + " ".join(f"{100*(duration_s/t)/c:.0f}%@{c:.0f}x"
                   for t, c in zip(enc_times, enc_ceils)),
        file=sys.stderr,
    )

    # stage attribution of one encode under best-effort conditions
    _encode_stage_attribution(enc, samples, duration_s)

    # --- decode (decode_i16, the export path) ---
    best_d, med_d = min(dec_times), float(np.median(dec_times))
    emit(
        "decode_realtime_factor_44k_stereo", duration_s, best_d, med_d,
        **_ceiling_fields(dec_times, dec_ceils, duration_s),
    )
    print(
        f"# decode {duration_s:.0f}s stereo in {best_d*1000:.1f} ms "
        f"(median {med_d*1000:.1f} ms), {len(pcm)} samples; transfers: "
        f"{words_bytes/1e6:.1f} MB up + {down_bytes/1e6:.1f} MB down "
        f"(downloads run ~half the up-rate on this relay)",
        file=sys.stderr,
    )

    # --- FLAC export (decode + FLAC encode level 5, the `glc -d` default:
    # streamed, so host FLAC math overlaps the decode's transfers) ---
    best_f, med_f = min(flac_times), float(np.median(flac_times))
    emit(
        "flac_export_realtime_factor_44k_stereo", duration_s, best_f, med_f,
        **_ceiling_fields(flac_times, flac_ceils, duration_s),
    )
    print(
        f"# decode+flac(level 5) {duration_s:.0f}s stereo in "
        f"{best_f*1000:.1f} ms (median {med_f*1000:.1f} ms), "
        f"{len(flac_bytes)} bytes",
        file=sys.stderr,
    )

    # --- album encode: 4 same-bucket tracks through ONE batched device
    # program (one upload + dispatch + download) vs the serial file loop ---
    track = np.clip(
        make_signal(15.0, sample_rate) * 32767.0, -32768, 32767
    ).astype(np.int16)
    tracks = [(track, 2)] * 4  # 4 × 15 s = the same 60 s of audio
    enc.encode_many(tracks)  # warmup (batch program compile)
    [enc.encode_pcm16(t, c) for t, c in tracks]  # warm serial comparator
    alb_times, ser_times = [], []
    for _ in range(runs):
        t0 = time.perf_counter()
        many = [serialize_encoded(e) for e in enc.encode_many(tracks)]
        alb_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        ser = [serialize_encoded(enc.encode_pcm16(t, c)) for t, c in tracks]
        ser_times.append(time.perf_counter() - t0)
    best_a, med_a = min(alb_times), float(np.median(alb_times))
    best_s = min(ser_times)
    assert many == ser, "batched album must be bit-identical to serial"
    # each rep times batched and serial back-to-back, so the per-rep ratio
    # is link-phase-fair; the official vs_serial is the median of those
    vs = float(np.median([s_ / a for a, s_ in zip(alb_times, ser_times)]))
    emit(
        "album_encode_realtime_factor_44k_stereo", duration_s, best_a, med_a,
        vs_serial=round(vs, 2),
    )
    print(
        f"# album 4x15s stereo: batched {best_a*1000:.1f} ms vs serial "
        f"{best_s*1000:.1f} ms (median per-rep {vs:.2f}x, bit-identical; "
        + " ".join(f"{s_/a:.2f}x" for a, s_ in zip(alb_times, ser_times))
        + ")",
        file=sys.stderr,
    )

    # --- album decode: the same 4 tracks through decode_many (one batched
    # device program) vs the serial per-file decode_i16 loop ---
    album_eas = enc.encode_many(tracks)
    dec.decode_many(album_eas)                      # warmup
    [dec.decode_i16(ea) for ea in album_eas]        # warm serial comparator
    dalb_times, dser_times = [], []
    for _ in range(runs):
        t0 = time.perf_counter()
        outs_b = dec.decode_many(album_eas)
        dalb_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        outs_s = [dec.decode_i16(ea) for ea in album_eas]
        dser_times.append(time.perf_counter() - t0)
    best_da, med_da = min(dalb_times), float(np.median(dalb_times))
    best_ds = min(dser_times)
    for ob, os_ in zip(outs_b, outs_s):  # within 1 LSB (lax.map fusion)
        assert len(ob) == len(os_)
        assert int(np.abs(ob.astype(np.int32)
                          - os_.astype(np.int32)).max(initial=0)) <= 1
    vs_d = float(np.median([s_ / a for a, s_ in zip(dalb_times, dser_times)]))
    emit(
        "album_decode_realtime_factor_44k_stereo", duration_s, best_da,
        med_da, vs_serial=round(vs_d, 2),
    )
    print(
        f"# album decode 4x15s stereo: batched {best_da*1000:.1f} ms vs "
        f"serial {best_ds*1000:.1f} ms (median per-rep {vs_d:.2f}x, <=1 LSB)",
        file=sys.stderr,
    )

    # --- diagnostics: device-compute-only realtime factor + compaction ---
    try:
        _device_compute_diagnostics(enc, dec, encoded, samples, duration_s)
    except Exception as e:
        print(f"# diagnostics failed: {e}", file=sys.stderr)


def _decode_upload_bytes(dec, encoded) -> int:
    """Bytes decode_i16 uploads for this container (packed words + raw)."""
    from glc_tpu.codec.decoder import _packed_slices
    from glc_tpu.codec.tables import chunk_size_for

    fs = encoded.frame_set
    F = fs.num_frames
    cfg = dec.config
    chunk = chunk_size_for(max(F, 1), cfg.decode_chunk_frames)
    total = 0
    for start in range(0, F, chunk):
        valid = min(chunk, F - start)
        words, _b, _rb = _packed_slices(
            fs, start, valid, chunk, cfg.n, cfg.reference_compat
        )
        total += words.nbytes  # raw section included (single-buffer layout)
    return total


def _encode_stage_attribution(enc, samples, duration_s) -> None:
    """One instrumented encode: attribute wall time to upload / device
    dispatch+compute / download+assemble / serialize (VERDICT round-2 #1:
    'a stderr line attributing the residual')."""
    import jax

    from glc_tpu import serialize_encoded
    from glc_tpu.codec.encoder import bucket_upload, upload_geometry

    cfg = enc.config
    t0 = time.perf_counter()
    # the encoder's own geometry helpers — the measured "upload" can never
    # desynchronize from what encode_pcm16 actually uploads
    _T, _F, _pad, _plan, _need, Tb = upload_geometry(len(samples), 2, cfg)
    xup = bucket_upload(samples, len(samples), Tb, 2, np.int16)
    t_frame = time.perf_counter() - t0

    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(xup))
    t_up = time.perf_counter() - t0

    t0 = time.perf_counter()
    encoded = enc.encode_pcm16(samples, 2)
    t_enc = time.perf_counter() - t0

    t0 = time.perf_counter()
    serialize_encoded(encoded)
    t_ser = time.perf_counter() - t0

    resid = t_enc - t_frame - t_up
    print(
        f"# encode stage attribution: framing {t_frame*1000:.0f} ms + "
        f"upload {t_up*1000:.0f} ms ({xup.nbytes/1e6:.1f} MB) + "
        f"device+download+assemble {max(resid, 0)*1000:.0f} ms + "
        f"serialize {t_ser*1000:.1f} ms (e2e {t_enc*1000:.0f} ms; upload "
        f"re-probed separately, so overlap makes stages not strictly "
        f"additive)",
        file=sys.stderr,
    )


def _device_compute_diagnostics(enc, dec, encoded, samples, duration_s):
    import jax

    from glc_tpu.ops.encode import encode_interleaved_device

    fs = encoded.frame_set
    max_row_nnz = int(fs.nnz.max()) if fs.nnz.size else 0
    print(
        f"# compaction: max per-(frame,channel) nnz = {max_row_nnz} "
        f"(sort-free cumsum+scatter path; on-chip breakdown: dispatch "
        f"~26 ms, scatter ~20 ms, MDCT+mask+quantize ~1 ms — gather/"
        f"chunked/unique-indices variants measured neutral or worse)",
        file=sys.stderr,
    )

    tb = enc._tables
    tables = (tb.cos_table, tb.window, tb.norm, tb.band_mask,
              tb.band_inv_count, tb.band_pf, tb.band_of, tb.inv_w)
    budget = 4096 * 2 * 1024 // 8
    # Identical (program, args) dispatches get memoized somewhere in the
    # relay chain (measured: 0.04 ms "runs" of an 88 ms program), so
    # force real execution: distinct resident inputs, and a 1-element
    # download per call that the whole chain must produce.  This is the
    # SHIPPING program (encode_interleaved_device, on-device planarize).
    variants = []
    for i in range(8):
        s = samples.copy()
        s[i] = s[i] ^ 1
        variants.append(jax.device_put(s))
    jax.block_until_ready(variants)
    run = lambda s: encode_interleaved_device(
        s, np.int32(0), *tables, channels=2, lead=512,
        k_frames=4096, budget=budget, pad_hops=4097, pcm16=True)
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
    valid = min(F, chunk)
    words, budget2, rbudget = _packed_slices(
        fs, 0, valid, chunk, 1024, True
    )
    # perturb an is_raw PAD slot (frames beyond `valid` are discarded by
    # the host) — in the single-buffer layout the buffer TAIL is the raw
    # section whenever rbudget > 0, so index the flag section explicitly
    assert valid < chunk, "need at least one pad flag slot to perturb"
    flag0 = budget2 + (chunk * 2) // 2 + chunk * 2  # o1 + K*C (C=2)
    carries = []
    for i in range(8):
        w = words.copy()
        w[flag0 + valid + (i % (chunk - valid))] ^= 1
        carries.append(jax.device_put(w))
    jax.block_until_ready(carries)
    zero_carry = jax.device_put(np.zeros((2, 1024), np.float32))

    def drun(w):
        return decode_chunk_packed_device(
            w, zero_carry, np.int32(min(F, chunk)),
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


if __name__ == "__main__":
    main()
