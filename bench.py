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
    serial per-file loop it replaces (reference src/main.rs:545-583);
  * long file: a 600 s encode, attributed against same-size consuming
    probes (see _longfile_measure; GLC_BENCH_SUBPROC=1 runs it in a fresh
    child process instead, for A/B-ing the wire-phase conclusion).

The reference publishes no numbers (SURVEY.md §6); the north star is ≥500×
realtime encode per chip (BASELINE.json).  `vs_baseline` is measured against
that 500× target for every metric.

Link-ceiling attribution: the host↔device relay in this environment swings
6-70 MB/s between runs and is HALF-DUPLEX with asymmetric directions, so a
ceiling probed once is meaningless for a run made seconds later.  Every
timed pipeline run is therefore BRACKETED by adjacent bandwidth probes of
the same transfer direction(s) — the probe just before it and the one just
after (the next run's pre-probe, so bracketing costs no extra wire) — and
attributed against their mean; each metric's official
`pct_of_link_ceiling` is the MEDIAN over runs of (achieved / own-probes
ceiling) — the best single pairing is also reported but is noisy in both
directions (probes that under-read the link their run actually got show
>100%).

Upload probes must CONSUME: `device_put` + `block_until_ready` completes
when the buffer is STAGED with the relay (measured 555-1042 MB/s, far
above any wire), not when it crosses the wire — so every upload probe
dispatches a tiny reduction over the uploaded array and downloads its
1-element result, which can only complete after the real transfer.  The
probe buffer is fully rewritten per probe in case the transport dedupes
repeated content.  Download probes are honest by construction (bytes must
arrive).  Ceiling bytes per metric:

  * encode: the irreducible i16 PCM upload (samples.nbytes) + the encoded
    container's bytes coming back down (the sparse pairs/stats must cross
    the link to be serialized — same both-directions accounting as the
    decode/flac lines);
  * decode: the packed container upload + the i16 PCM download;
  * flac_export: same transfers as decode (FLAC math is host work that
    overlaps them; measured 439x realtime host-only, so it hides).

decode/flac also report `pct_of_protocol_ceiling` (summary `ceil_fl`):
bytes at the probed bandwidths PLUS the relay's measured per-call floor
(~28 ms, stable across rounds) for each transfer the shipped pipeline
actually made (counted by the decoder's stats hook) beyond the two the
probes embed.  The bytes-only ceiling is unreachable by ANY pipeline
that makes >2 transfers: the floors are invisible inside slow-phase
reps (~1.1 s) but are 20+% of fast-phase reps (~450 ms), which is why
bytes-only ceil_pct swings with the wire phase while ceil_fl does not.

ARTIFACT CONTRACT (the driver records only the LAST ~2000 chars of output
and parses the LAST {"metric": ...} JSON line): per-metric JSON lines print
as each section completes, but the FINAL line of the whole run is the
flagship encode-e2e metric re-emitted with a compact `summary` field
carrying every other metric — so the driver's `parsed` is the flagship
number and the tail always contains every result.  _build_final_line keeps
that line < 1500 chars (pinned by tests/test_bench_contract.py); verbose
diagnostics go to stderr BEFORE it.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# short-key → compact per-metric dict; assembled into the final summary line
SUMMARY: dict = {}


def make_signal(duration_s: float, sample_rate: int = 44100) -> np.ndarray:
    """Stereo program-like material: chord + sweep + noise bed (keeps the
    sparse path honest — pure tones over-flatter the codec).

    The sweep's clock wraps every 60 s: its instantaneous frequency is
    440 + 200·ts Hz, which for an UNwrapped 600 s run crosses Nyquist at
    t≈108 s — beyond that the "sweep" is full-band aliased noise, and a
    long-file metric on it measures content density, not duration scaling
    (round 4 traced the r3 long-file collapse to exactly this: every
    segment overflowing the compaction budget into dense transfers).
    ts == t exactly for t < 60, so every ≤60 s signal is bit-identical to
    what earlier rounds measured."""
    t = np.arange(int(sample_rate * duration_s), dtype=np.float32) / sample_rate
    ts = np.mod(t, np.float32(60.0))
    left = (
        0.30 * np.sin(2 * np.pi * 261.63 * t)
        + 0.20 * np.sin(2 * np.pi * 329.63 * t)
        + 0.15 * np.sin(2 * np.pi * (440.0 + 100.0 * ts) * ts)
    )
    rng = np.random.default_rng(1234)
    noise = rng.standard_normal(len(t)).astype(np.float32) * 0.01
    right = left * 0.9 + noise
    out = np.empty(2 * len(t), np.float32)
    out[0::2] = left + noise
    out[1::2] = right
    return out


def make_signal_i16(duration_s: float, sample_rate: int = 44100) -> np.ndarray:
    return np.clip(
        make_signal(duration_s, sample_rate) * 32767.0, -32768, 32767
    ).astype(np.int16)


def emit(metric: str, duration_s: float, best: float, med: float,
         key=None, **extra) -> dict:
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
    if key is not None:
        compact = {"x": line["value"], "med": line["median_value"]}
        if "pct_of_link_ceiling" in extra:
            compact["ceil_pct"] = extra["pct_of_link_ceiling"]
        if "pct_of_link_ceiling_range" in extra:  # per-rep [min, max]
            compact["cp"] = extra["pct_of_link_ceiling_range"]
        if "pct_of_protocol_ceiling" in extra:  # bytes + per-call floors
            compact["ceil_fl"] = extra["pct_of_protocol_ceiling"]
        if "vs_serial" in extra:
            compact["vs_serial"] = extra["vs_serial"]
        if "stages" in extra:  # [pack, disp, wait] ms medians
            compact["st"] = [extra["stages"][k]
                             for k in ("pack_ms", "disp_ms", "wait_ms")]
        SUMMARY[key] = compact
    return line


def _pct_of(times, ceils, duration_s) -> float:
    """Median per-rep share of a per-rep ceiling, in percent."""
    return round(float(np.median(
        [100.0 * (duration_s / t) / c for t, c in zip(times, ceils)]
    )), 1)


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
        # [min, max] of the per-rep ratios: a tight range while absolute
        # times swing 2x proves the best/median time spread is the wire's
        # bandwidth phases, not the pipeline (each rep tracks its OWN
        # adjacent probe)
        pct_of_link_ceiling_range=[round(min(ratios)), round(max(ratios))],
    )


def _build_final_line(flagship: dict, summary: dict) -> str:
    """The LAST line of bench output (see ARTIFACT CONTRACT above): the
    flagship encode-e2e metric dict plus a compact `summary` of every other
    metric.  Must stay < 1500 chars — well under the driver's ~2000-char
    tail — so adding metrics can never push the flagship number out of the
    artifact again (tests/test_bench_contract.py pins this with
    representative data)."""
    line = dict(flagship)
    line["summary"] = dict(summary)
    s = json.dumps(line, separators=(",", ":"))
    if len(s) >= 1500:
        # hard guard ladder: shed verbose sub-keys, then drop whole
        # summary entries (least-important last-inserted first), then the
        # summary itself — the flagship metric dict must ALWAYS survive
        # intact, whatever future metrics get added
        for d in line["summary"].values():
            if isinstance(d, dict):
                d.pop("runs", None)
        s = json.dumps(line, separators=(",", ":"))
        while len(s) >= 1500 and line["summary"]:
            line["summary"].pop(next(reversed(line["summary"])))
            s = json.dumps(line, separators=(",", ":"))
        if len(s) >= 1500:
            line.pop("summary", None)
            s = json.dumps(line, separators=(",", ":"))
    return s


# --- long-file (600 s) measurement ----------------------------------------


def _longfile_measure() -> dict:
    """Measure the 600 s stereo encode: first (warm, incl. segment-plan
    compiles) then 3 hot runs, each with ADJACENT upload AND download
    probes for attribution — the ceiling counts both irreducible
    directions (106 MB PCM up + the container's bytes down), same
    accounting as the 60 s encode metric.

    The probe is a CONSUMING upload (a 1-element reduction round-trip) of
    the SAME 106 MB size class AND the same piecewise upload protocol as
    the pipeline's own upload (upload_resident): the wire's burst credit
    covers tens of MB, so a smaller probe over-reads the sustained regime
    this metric lives in (measured: 32 MB probes 40-50 MB/s adjacent to a
    106 MB pipeline sustaining 13 MB/s — the metric read "26% of ceiling"
    against a ceiling the wire cannot give 106 MB), and a single-transfer
    probe measures a different regime than the shipped 16 MB-piece
    protocol (measured: single 17-44 MB/s across sessions vs 28-34 MB/s
    stable piecewise; the wire itself swings 6-50 MB/s between minutes).

    Runs in-process by default: round 4 established that the round-3
    "in-bench vs standalone" long-file gap was wire phases misattributed
    by staging-only probes, not session state (VERDICT r3 item 2's "find
    the actual mechanism") — GLC_BENCH_SUBPROC=1 re-runs the fresh-child
    A/B.  Anchor: the duration-scaling test of reference
    tests/test_performance.rs:49-53.
    """
    import jax
    import jax.numpy as jnp

    from glc_tpu import Encoder, serialize_encoded

    sample_rate = 44100
    long_s = 600.0
    long_pcm = make_signal_i16(long_s, sample_rate)
    probe_buf = long_pcm.copy()
    _consume = jax.jit(lambda x: x[:1].astype(jnp.int32).sum())

    # The probe uploads through the SAME piecewise protocol the encoder
    # ships (upload_resident: 16 MB pieces + device concat — chosen
    # because the relay's sustained single-transfer rate swings far below
    # its burst rate): a single 106 MB device_put probes a DIFFERENT wire
    # regime, over-reading the ceiling in burst-friendly phases (measured:
    # the pipeline stable at 28-34 MB/s vs single-transfer probes at
    # 17-44 MB/s across sessions — one capture read 68% of a ceiling the
    # shipped protocol cannot reach, others 97%).
    from glc_tpu.codec.encoder import upload_resident

    def probe_up() -> float:
        np.add(probe_buf, 1, out=probe_buf)
        t0 = time.perf_counter()
        np.asarray(_consume(upload_resident(probe_buf)))
        return probe_buf.nbytes / (time.perf_counter() - t0)

    enc = Encoder(sample_rate)
    t0 = time.perf_counter()
    data = serialize_encoded(enc.encode_pcm16(long_pcm, 2))
    warm = time.perf_counter() - t0
    container_bytes = len(data)
    del data
    # One steady-state run before the scored reps: the FIRST hot run after
    # the compile pass consistently pays a one-time ~2x tax the later runs
    # don't (r5 no-probe ramp on-chip: 51.7 → 124.1 → 142.1 → 85.0 →
    # 126.0x; r4 driver capture: 55.2 → 88.1 → 127.9x) — an executable/
    # allocator residency effect, not wire phase.  The metric is
    # steady-state encode throughput, so the scored reps start there.
    t0 = time.perf_counter()
    serialize_encoded(enc.encode_pcm16(long_pcm, 2))
    warm2 = time.perf_counter() - t0
    probe_up()  # compile the consuming probe outside the timed reps

    # download probe of the container's own size class (relay bandwidth is
    # strongly size-dependent; see the module docstring)
    _bump = jax.jit(lambda x, i: x + i)
    down_dev = jax.device_put(
        np.zeros(max(container_bytes, 1 << 20) // 2, np.int16))
    jax.block_until_ready(down_dev)
    _probe_n = [0]

    def probe_down() -> float:
        _probe_n[0] += 1              # distinct args defeat memoization
        src = _bump(down_dev, np.int16(_probe_n[0]))
        jax.block_until_ready(src)
        t0 = time.perf_counter()
        arr = np.asarray(src)
        return arr.nbytes / (time.perf_counter() - t0)

    probe_down()  # compile

    # Each hot run is BRACKETED by probe pairs (one closing pair after the
    # last run) and attributed against their mean: these runs are 10-25 s
    # each, long enough for the wire phase to shift inside them — a
    # decaying phase halved a pre-probe-only pct in one capture (runs
    # 58.7→42.4x while the pre-probes read the earlier, faster wire).
    # relay per-call floor for the protocol model (tiny materializes; see
    # the main loop's note — the floors are invisible in slow phases and
    # 10-30% of fast-phase runs)
    _tiny = jax.device_put(np.zeros(8, np.int16))
    jax.block_until_ready(_tiny)
    _fl = []
    for _i in range(5):
        src = _bump(_tiny, np.int16(64 + _i))
        jax.block_until_ready(src)
        t0 = time.perf_counter()
        np.asarray(src)
        _fl.append(time.perf_counter() - t0)
    call_floor_s = float(np.median(_fl))

    plog, hots, run_stats = [], [], []
    for _ in range(4):
        plog.append((probe_up(), probe_down()))
        st: dict = {}
        t0 = time.perf_counter()
        serialize_encoded(enc.encode_pcm16(long_pcm, 2, stats=st))
        hots.append(time.perf_counter() - t0)
        run_stats.append(st)
    plog.append((probe_up(), probe_down()))  # closing bracket
    floors = [
        float(np.mean([
            long_pcm.nbytes / u + container_bytes / d
            for u, d in plog[k : k + 2]
        ]))
        for k in range(len(hots))
    ]
    ceils = [long_s / f for f in floors]
    # protocol floors: the upload probe shares the pipeline's piecewise
    # protocol (its bandwidth already embeds the upload pieces' floors for
    # the same byte count), so only the per-segment DOWNLOAD transfers
    # beyond the single download probe add uncounted floors
    from glc_tpu.codec.encoder import upload_piece_count

    probe_pieces = upload_piece_count(probe_buf)
    ceils_fl = [
        long_s / (f + (max(0, st.get("up_n", 0) - probe_pieces)
                       + max(0, st.get("down_n", 0) - 1)) * call_floor_s)
        for f, st in zip(floors, run_stats)
    ]
    i = int(np.argmin(hots))
    ratios = [100.0 * (long_s / h) / c for h, c in zip(hots, ceils)]
    ratios_fl = [100.0 * (long_s / h) / c for h, c in zip(hots, ceils_fl)]
    st0 = run_stats[0]
    return {
        "x": round(long_s / hots[i], 1),
        "pct_adj": round(float(np.median(ratios)), 1),
        "pct_adj_fl": round(float(np.median(ratios_fl)), 1),
        "transfers": [st0.get("up_n", 0), st0.get("down_n", 0)],
        "floor_ms": round(call_floor_s * 1e3, 1),
        "runs": [round(long_s / h, 1) for h in hots],
        "warm_ms": round(warm * 1000),
        "warm2_ms": round(warm2 * 1000),
    }


def longfile_child() -> None:
    """`python bench.py --longfile-child`: the fresh-subprocess body.
    Prints ONE JSON line on stdout; diagnostics ('# ...') on stderr."""
    res = _longfile_measure()
    print(json.dumps({"long_file_600s": res}))


def _run_longfile_fresh():
    """Run the 600 s case in a FRESH subprocess (GLC_BENCH_SUBPROC=1;
    the parent idles on subprocess.run, so the tunnel is the child's
    alone).  Costs one extra chip claim (~200 s, occasionally much more —
    the reason this is no longer the default; the wire-phase mechanism
    the child was meant to dodge turned out to be probe fiction, see
    _longfile_measure)."""
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--longfile-child"],
            capture_output=True, text=True, timeout=720,
        )
        for ln in p.stderr.splitlines():
            if ln.startswith("#"):
                print(f"# [long-child] {ln[1:].strip()}", file=sys.stderr)
        for ln in reversed(p.stdout.splitlines()):
            if ln.startswith("{"):
                return json.loads(ln)["long_file_600s"]
        print(
            f"# long-file child produced no result (rc={p.returncode}; "
            f"stderr tail: {p.stderr[-300:]!r})",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"# long-file child failed: {e}", file=sys.stderr)
    return None


def _emit_longfile(res: dict, fresh: bool) -> None:
    line = {
        "metric": "long_file_600s_encode_realtime_factor",
        "value": res["x"],
        "unit": "x_realtime",
        "vs_baseline": round(res["x"] / 500.0, 3),
        "pct_of_adjacent_probes": res["pct_adj"],
        "pct_of_protocol_ceiling": res.get("pct_adj_fl"),
        "transfers": res.get("transfers"),
        "call_floor_ms": res.get("floor_ms"),
        "fresh_subprocess": fresh,
    }
    print(json.dumps(line))
    sys.stdout.flush()
    SUMMARY["long600"] = {
        "x": res["x"], "pct_adj": res["pct_adj"],
        "ceil_fl": res.get("pct_adj_fl"), "runs": res["runs"],
        "fresh": fresh,
    }
    print(
        f"# long file 600s stereo ({'fresh subprocess' if fresh else 'in-process'}): "
        f"first {res['warm_ms']} ms (incl. segment-plan compiles), "
        f"steady-state entry run {res.get('warm2_ms', '?')} ms (first hot "
        f"run pays a one-time residency tax, untimed by design), best hot "
        f"{res['x']}x realtime at {res['pct_adj']}% of adjacent upload "
        f"probes (runs: " + " ".join(f"{r}x" for r in res["runs"]) + ")",
        file=sys.stderr,
    )


def _claim_chip_with_retry(minutes: float = 45.0,
                           probe_timeout_s: float = 600.0) -> None:
    """Block until the TPU backend initializes, retrying through transient
    pool exhaustion.  The relay's chip pool intermittently returns
    UNAVAILABLE for tens of minutes (measured r5: one claim hung 80 min
    then errored, two more errored instantly, a later attempt succeeded);
    without this, a driver bench run launched into such a window would
    record NO artifact at all.

    A degraded-pool claim can HANG (not error) for 25-80 min, and a
    blocked PJRT init cannot be cancelled in-process — so the pool is
    probed first in a KILLABLE child process with a timeout (healthy
    claims take ~200 s; 600 s is generous).  Only after a probe succeeds
    does this process claim directly.  Cost on the healthy path: one
    extra ~200 s claim — acceptable for an artifact-or-nothing run.
    jax caches backend-init failures per-process, so the direct-claim
    fallback clears the backend registry between retries."""
    import jax

    deadline = time.monotonic() + minutes * 60.0
    probe_src = (
        "import jax, numpy as np;"
        "jax.block_until_ready(jax.device_put(np.zeros(8, np.int32)));"
        "print('CLAIM_OK')"
    )
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe_src],
                capture_output=True, text=True,
                timeout=min(probe_timeout_s,
                            max(60.0, deadline - time.monotonic())),
            )
            if r.returncode == 0 and "CLAIM_OK" in r.stdout:
                break
            reason = (r.stderr or r.stdout).strip().splitlines()
            reason = reason[-1][:120] if reason else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            reason = "probe timed out (claim hanging)"
        except Exception as e:  # noqa: BLE001 — spawn failures
            reason = f"{type(e).__name__}: {str(e)[:120]}"
        if time.monotonic() > deadline:
            raise RuntimeError(f"chip pool unavailable for {minutes:g} min "
                               f"(last: {reason})")
        print(f"# chip probe failed ({reason}); retrying in 60 s",
              file=sys.stderr)
        sys.stderr.flush()
        time.sleep(60)
    # pool just served the probe — claim directly (can still be slow, but
    # a hang here means the pool flipped within seconds of a success)
    while True:
        try:
            jax.block_until_ready(jax.device_put(np.zeros(8, np.int32)))
            return
        except Exception as e:  # noqa: BLE001 — init errors vary by layer
            if time.monotonic() > deadline:
                raise
            print(
                f"# chip claim failed ({type(e).__name__}: {str(e)[:120]});"
                " retrying in 60 s",
                file=sys.stderr,
            )
            sys.stderr.flush()
            try:
                import jax.extend.backend as _jeb

                _jeb.clear_backends()
            except Exception:
                pass
            time.sleep(60)


def main() -> None:
    duration_s = 60.0
    sample_rate = 44100
    # 16-bit-sourced program material (what a WAV/FLAC input actually is):
    # the encoder's exact i16 fast path applies, as it does for `glc x.wav`
    samples = make_signal_i16(duration_s, sample_rate)

    import jax

    try:
        _claim_chip_with_retry(
            minutes=float(os.environ.get("GLC_BENCH_CLAIM_MINUTES", "45")))
    except Exception as e:  # noqa: BLE001 — pool outage exhausted the retry
        # Artifact-or-nothing guard: the driver parses the LAST
        # {"metric": ...} JSON line of output.  A chip-pool outage that
        # outlasts the retry budget (observed r5: >7 h of UNAVAILABLE)
        # must still leave an explicit, parseable record of WHY there is
        # no number — value 0 + error field, never a fabricated figure.
        print(json.dumps({
            "metric": "encode_e2e", "value": 0.0, "unit": "x_realtime",
            "vs_baseline": 0.0,
            "error": f"chip_unavailable: {str(e)[:300]}",
        }))
        sys.stdout.flush()
        raise

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
    # 0.08 s) — and an upload only provably CROSSES THE WIRE when a
    # consuming dispatch's output comes back (see module docstring), so
    # probe_up rewrites its whole buffer and round-trips a 1-element
    # reduction.
    probe_buf = samples.copy()

    import jax.numpy as jnp

    _consume = jax.jit(lambda x: x[:1].astype(jnp.int32).sum())
    np.asarray(_consume(jax.device_put(probe_buf)))  # compile

    _bump = jax.jit(lambda x, i: x + i)
    probe_dev = jax.device_put(samples)
    jax.block_until_ready(probe_dev)
    _probe_n = [0]

    def probe_up() -> float:
        np.add(probe_buf, 1, out=probe_buf)   # all-new bytes per probe
        t0 = time.perf_counter()
        np.asarray(_consume(jax.device_put(probe_buf)))
        return up_bytes / (time.perf_counter() - t0)

    def probe_down() -> float:
        _probe_n[0] += 1                  # distinct args defeat memoization
        src = _bump(probe_dev, np.int16(_probe_n[0]))
        jax.block_until_ready(src)
        t0 = time.perf_counter()
        np.asarray(src)
        return up_bytes / (time.perf_counter() - t0)

    # Per-call relay floor, measured here because the decode/flac ceiling
    # model needs it: every wire transfer pays ~28 ms regardless of size
    # (stable across rounds: 29/31.7/28 ms in r4/r5 captures), which a
    # bytes-only ceiling omits.  That omission only SHOWS when the wire is
    # fast: the decode pipeline makes ~6 transfers per 60 s rep, so ~4
    # floors beyond the probes' own two ≈ 115 ms — invisible inside a
    # 1.1 s slow-phase rep (r5_run1 decode ceil_pct 98.8) but 20+% of a
    # 450 ms fast-phase rep (r5_run2: 77.4 bytes-only, with the decomposed
    # gap ≈ extra_transfers × floor, verified by an on-chip protocol
    # experiment: settled gathers are free, async copies do localize).
    _tiny = jax.device_put(np.zeros(8, np.int16))
    jax.block_until_ready(_tiny)
    _floors = []
    for _i in range(5):
        src = _bump(_tiny, np.int16(64 + _i))
        jax.block_until_ready(src)
        t0 = time.perf_counter()
        np.asarray(src)
        _floors.append(time.perf_counter() - t0)
    call_floor_s = float(np.median(_floors))
    print(f"# relay per-call floor: {call_floor_s*1e3:.1f} ms",
          file=sys.stderr)

    def _floor_adj(floor_s: float, st: dict) -> float:
        """Protocol-aware wire floor: bytes at the probed bandwidths plus
        one per-call floor for each transfer the SHIPPED pipeline actually
        made (counted by the decoder's stats hook) beyond the two the
        probes already embed in their bandwidth estimates."""
        extra = max(0, st.get("up_n", 0) + st.get("down_n", 0) - 2)
        return floor_s + extra * call_floor_s

    # 11 reps per metric (VERDICT r3 item 6: a rep costs ~0.3 s; more reps
    # shrink the capture spread the relay's bandwidth phases cause)
    runs = 11

    # --- timed runs, ROUND-ROBIN across the three pipelines: the relay's
    # bandwidth phases last seconds-to-minutes, so running each metric's N
    # repeats back-to-back lets one slow phase doom one metric while its
    # neighbors look fine (observed: decode 877 ms median in a capture
    # where the same code measures 294-430 ms standalone).  Interleaving
    # spreads any phase across all metrics; the adjacent probes still
    # attribute each run against its own link conditions. ---
    container_bytes = len(data)
    # Each run is attributed against the MEAN of its BRACKETING probe
    # pairs: the pair just before it and the pair just after it — which is
    # the next metric's pre-probe, so bracketing costs zero extra wire
    # (the last run of the capture falls back to its pre-probe alone).  A
    # pre-probe-only attribution misreads any wire-phase shift that lands
    # inside the run itself: observed per-rep ceiling-ratio ranges of
    # [32, 196] on a swinging wire, and a decaying phase halved the
    # long-file section's pre-probe-only pct in one capture.
    probe_log: list = []          # chronological (bw_u, bw_d)

    def take_probe() -> None:
        probe_log.append((probe_up(), probe_down()))

    def floor_secs(idx: int, up_b: float, down_b: float) -> float:
        """Wire-floor seconds for the run bracketed by probe_log[idx] and
        probe_log[idx+1]: mean of the two probes' transfer-time estimates
        (pre-probe alone when no probe follows)."""
        pairs = probe_log[idx : idx + 2]
        return float(np.mean([up_b / u + down_b / d for u, d in pairs]))

    enc_times, dec_times, flac_times = [], [], []
    enc_stages, dec_stages, flac_stages = [], [], []
    for _ in range(runs):
        take_probe()
        ste: dict = {}
        t0 = time.perf_counter()
        data = serialize_encoded(enc.encode_pcm16(samples, 2, stats=ste))
        enc_times.append(time.perf_counter() - t0)
        enc_stages.append(ste)

        take_probe()
        st: dict = {}
        t0 = time.perf_counter()
        pcm = dec.decode_i16(encoded, stats=st)
        dec_times.append(time.perf_counter() - t0)
        dec_stages.append(st)

        take_probe()
        stf: dict = {}
        t0 = time.perf_counter()
        flac_bytes = encode_flac_i16_streaming(
            dec.decode_i16_stream(
                encoded, chunk_frames=dec.config.stream_chunk_frames,
                stats=stf),
            sample_rate, 2, 5, n_total // 2
        )
        flac_times.append(time.perf_counter() - t0)
        flac_stages.append(stf)

    # per-run ceilings from the bracketing probes (post-loop: the post-
    # probe of run k is the pre-probe of run k+1 in the interleaved order)
    enc_floors = [floor_secs(3 * k, up_bytes, container_bytes)
                  for k in range(runs)]
    enc_ceils = [duration_s / f for f in enc_floors]
    enc_ceils_fl = [duration_s / _floor_adj(f, st)
                    for f, st in zip(enc_floors, enc_stages)]
    dec_floors = [floor_secs(3 * k + 1, words_bytes, down_bytes)
                  for k in range(runs)]
    dec_ceils = [duration_s / f for f in dec_floors]
    dec_ceils_fl = [duration_s / _floor_adj(f, st)
                    for f, st in zip(dec_floors, dec_stages)]
    flac_floors = [floor_secs(3 * k + 2, words_bytes, down_bytes)
                   for k in range(runs)]
    flac_ceils = [duration_s / f for f in flac_floors]
    flac_ceils_fl = [duration_s / _floor_adj(f, stf)
                     for f, stf in zip(flac_floors, flac_stages)]

    # Timeout resilience: after every section below, the flagship line is
    # re-printed with the summary-so-far (same format as the final line).
    # If the driver's timeout kills the run mid-way, the LAST parseable
    # metric line is still the flagship with everything measured so far.
    best, med = min(enc_times), float(np.median(enc_times))
    flagship = emit(
        "encode_realtime_factor_44k_stereo", duration_s, best, med,
        pct_of_protocol_ceiling=_pct_of(enc_times, enc_ceils_fl, duration_s),
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
    stages_med = {
        k: round(float(np.median([s[k] for s in dec_stages])))
        for k in ("pack_ms", "disp_ms", "wait_ms")
    }
    emit(
        "decode_realtime_factor_44k_stereo", duration_s, best_d, med_d,
        key="decode", stages=stages_med,
        pct_of_protocol_ceiling=_pct_of(dec_times, dec_ceils_fl, duration_s),
        **_ceiling_fields(dec_times, dec_ceils, duration_s),
    )
    print(
        f"# decode {duration_s:.0f}s stereo in {best_d*1000:.1f} ms "
        f"(median {med_d*1000:.1f} ms), {len(pcm)} samples; transfers: "
        f"{words_bytes/1e6:.1f} MB up + {down_bytes/1e6:.1f} MB down "
        f"(downloads run ~half the up-rate on this relay)",
        file=sys.stderr,
    )
    print(
        "# decode per-rep stages (pack/disp/wait ms of the shipped loop, "
        "VERDICT r4 item 1): "
        + " ".join(
            f"{s['pack_ms']:.0f}/{s['disp_ms']:.0f}/{s['wait_ms']:.0f}"
            for s in dec_stages
        )
        + f"; medians {stages_med}",
        file=sys.stderr,
    )

    # --- FLAC export (decode + FLAC encode level 5, the `glc -d` default:
    # streamed, so host FLAC math overlaps the decode's transfers) ---
    best_f, med_f = min(flac_times), float(np.median(flac_times))
    emit(
        "flac_export_realtime_factor_44k_stereo", duration_s, best_f, med_f,
        key="flac",
        pct_of_protocol_ceiling=_pct_of(flac_times, flac_ceils_fl,
                                        duration_s),
        **_ceiling_fields(flac_times, flac_ceils, duration_s),
    )
    print(
        f"# decode+flac(level 5) {duration_s:.0f}s stereo in "
        f"{best_f*1000:.1f} ms (median {med_f*1000:.1f} ms), "
        f"{len(flac_bytes)} bytes",
        file=sys.stderr,
    )

    print(_build_final_line(flagship, SUMMARY))
    sys.stdout.flush()

    try:
        _album_bench(enc, dec, duration_s, sample_rate, runs)
    except Exception as e:
        print(f"# album bench failed: {e}", file=sys.stderr)
    print(_build_final_line(flagship, SUMMARY))
    sys.stdout.flush()

    # --- diagnostics: device-compute-only realtime factor + roofline ---
    try:
        _device_compute_diagnostics(enc, dec, encoded, samples, duration_s)
    except Exception as e:
        print(f"# diagnostics failed: {e}", file=sys.stderr)
    print(_build_final_line(flagship, SUMMARY))
    sys.stdout.flush()

    # --- recorded quality: compat reproduces the reference's documented
    # amplitude defect, clean mode beats it (VERDICT r4 item 8) ---
    try:
        _quality_bench(sample_rate)
    except Exception as e:
        print(f"# quality bench failed: {e}", file=sys.stderr)
    print(_build_final_line(flagship, SUMMARY))
    sys.stdout.flush()

    # --- long file LAST (its value is wire-phase-bound — the 60 s metrics
    # above must never be hostage to it under a driver timeout), in-process
    # with same-size consuming probes.  Round 3 blamed a "session-state
    # degradation" for in-bench long-file collapses; round 4 found the
    # actual mechanism: device_put+block_until_ready measures STAGING
    # (555-1042 MB/s), not the wire, and the wire's sustained rate swings
    # 6-50 MB/s between minutes — in-process vs subprocess never mattered,
    # the phases did.  GLC_BENCH_SUBPROC=1 still runs it in a fresh child
    # (costs a second ~200 s chip claim) for A/B-ing that conclusion. ---
    long_res = None
    if os.environ.get("GLC_BENCH_SUBPROC") == "1":
        long_res = _run_longfile_fresh()
        if long_res is not None:
            _emit_longfile(long_res, fresh=True)
    if long_res is None:
        try:
            _emit_longfile(_longfile_measure(), fresh=False)
        except Exception as e:
            print(f"# long-file diagnostic failed: {e}", file=sys.stderr)
    print(_build_final_line(flagship, SUMMARY))
    sys.stdout.flush()

    try:
        _album120_bench(enc, dec, sample_rate, runs, probe_up, probe_down,
                        call_floor_s)
    except Exception as e:
        print(f"# album120 bench failed: {e}", file=sys.stderr)

    # THE LAST LINE (see ARTIFACT CONTRACT in the module docstring): the
    # flagship metric re-emitted with every other metric in `summary`.
    print(_build_final_line(flagship, SUMMARY))
    sys.stdout.flush()


def _quality_bench(sample_rate: int) -> None:
    """Recorded quality numbers for the match-or-beat claim (VERDICT r4
    item 8): the reference documents an amplitude defect of up to ~25% on
    outlier samples (reference README.md:5-8), rooted in quirks Q1 (stereo
    gapless trim in interleaved units) and Q4 (raw frames windowed once) —
    reproduced in compat mode, fixed in clean mode
    (CodecConfig.reference_compat=False).  This prints both modes' stereo
    SNR / RMS deviation / max amplitude error on program material, so
    'clean mode beats the reference's documented defect' is a recorded
    measurement, not a latent flag.  Methodology mirrors the reference's
    own quality tests (SNR with 1000-sample edge-transient skip,
    tests/utils.rs:118-147; RMS deviation, test_comprehensive.rs:194-230).
    """
    from glc_tpu import CodecConfig, Decoder, Encoder

    dur = 5.0
    sig = make_signal(dur, sample_rate)
    res = {}
    for mode, cfg in (
        ("compat", CodecConfig()),
        ("clean", CodecConfig(reference_compat=False)),
    ):
        e = Encoder(sample_rate, config=cfg)
        d = Decoder(2, sample_rate, config=cfg)
        out = d.decode(e.encode(sig, 2))
        n = min(len(out), len(sig))
        # 1000 INTERLEAVED samples, exactly the reference's helper — its
        # calculate_snr indexes the interleaved buffer directly with no
        # channel scaling (utils.rs:117-133), so stereo skips 500/channel
        # there too; matching it keeps the numbers comparable
        sl = slice(1000, n - 1000)
        a, b = sig[:n][sl].astype(np.float64), out[:n][sl].astype(np.float64)
        err = a - b
        snr = 10.0 * np.log10(np.sum(a * a) / max(np.sum(err * err), 1e-20))
        rms_dev = abs(
            np.sqrt(np.mean(b * b)) / max(np.sqrt(np.mean(a * a)), 1e-20) - 1.0
        )
        max_amp = np.max(np.abs(err)) / max(np.max(np.abs(a)), 1e-20)
        res[mode] = {
            "snr_db": round(float(snr), 1),
            "rms_dev_pct": round(100.0 * float(rms_dev), 2),
            "max_amp_err_pct": round(100.0 * float(max_amp), 1),
        }
    print(json.dumps({
        "metric": "quality_stereo_5s",
        "value": res["clean"]["snr_db"],
        "unit": "dB_snr",
        "vs_baseline": None,
        "compat": res["compat"],
        "clean": res["clean"],
    }))
    sys.stdout.flush()
    SUMMARY["quality"] = {
        "compat_snr": res["compat"]["snr_db"],
        "clean_snr": res["clean"]["snr_db"],
        "compat_maxerr_pct": res["compat"]["max_amp_err_pct"],
        "clean_maxerr_pct": res["clean"]["max_amp_err_pct"],
    }
    print(
        f"# quality (stereo 5 s program material): compat mode "
        f"SNR {res['compat']['snr_db']} dB, max amplitude error "
        f"{res['compat']['max_amp_err_pct']}% (the reference's own "
        f"stereo-trim/raw-window defect — its README admits ~25% on its "
        f"material, README.md:5-8; this clip drives it harder); clean "
        f"mode SNR "
        f"{res['clean']['snr_db']} dB, max amplitude error "
        f"{res['clean']['max_amp_err_pct']}% — the beat-the-reference "
        f"number",
        file=sys.stderr,
    )


def _album_bench(enc, dec, duration_s, sample_rate, runs) -> None:
    """Album encode/decode: 4 same-bucket tracks through ONE batched device
    program (encode_many / decode_many) vs the serial per-file loop the
    reference uses (src/main.rs:545-583, src/ui.rs:317-359)."""
    from glc_tpu import serialize_encoded

    track = make_signal_i16(15.0, sample_rate)
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
        key="album_enc", vs_serial=round(vs, 2),
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
        med_da, key="album_dec", vs_serial=round(vs_d, 2),
    )
    print(
        f"# album decode 4x15s stereo: batched {best_da*1000:.1f} ms vs "
        f"serial {best_ds*1000:.1f} ms (median per-rep {vs_d:.2f}x, <=1 LSB)",
        file=sys.stderr,
    )


def _album120_bench(enc, dec, sample_rate, runs, probe_up, probe_down,
                    call_floor_s: float = 0.0) -> None:
    """Album at realistic track length: 4×120 s.  Each track is
    MULTI-segment/multi-chunk, so this exercises the multi-track pipelines
    at the scale the reference GUI's album export handles serially
    (src/ui.rs:291-402): full-depth interleaved dispatch on encode, the
    cross-track pipelined chunk scheduler on decode.  Decode at this scale
    is download-wire-bound — ~85 MB of PCM must come down a link that
    sustains 6-50 MB/s, so BOTH the batched path and the serial loop run
    at the wire ceiling and vs_serial is parity plus wire-phase noise
    (per-rep spread 0.5-1.9× measured for literally identical code; a
    probe-free controlled A/B on-chip measured batched/serial at exactly
    1.00 median over 8 interleaved reps).  The
    per-rep adjacent probes here attribute each side against the link it
    actually got: the honest claim is `pct_of_link_ceiling`, with
    vs_serial as the structural A/B.  Encode's interleaving measures
    ~1.1-1.4× vs serial.  Runs LAST: it is the most wire-expensive
    section and the metrics above must not be hostage to it under a
    driver timeout."""
    from glc_tpu import serialize_encoded

    dur120 = 480.0
    track120 = make_signal_i16(120.0, sample_rate)
    tracks120 = [(track120, 2)] * 4
    # 7 reps: at ~4-7 s per side the per-rep ratios span 0.5-1.6x of pure
    # wire noise (both sides move the same ~85 MB through the same wire;
    # the structural difference — cross-track overlap at track boundaries
    # — is worth single-digit percent) — 5 reps let two bad phases drag
    # the median to 0.8x; 7 costs ~40 s more and halves that leverage
    reps120 = max(7, runs // 2)
    enc.encode_many(tracks120)                        # warm segmented path
    [enc.encode_pcm16(t, c) for t, c in tracks120]    # warm serial
    # A/B order ALTERNATES per rep: the wire's bandwidth phases last
    # seconds-to-minutes, so a fixed batched-then-serial order lets one
    # phase boundary systematically favor whichever side runs second
    # (observed: three same-signed 0.36x decode reps from identical code
    # paths); alternation turns a phase into symmetric noise the median
    # absorbs
    e_t, s_t, e_idx, plog = [], [], [], []
    up120 = sum(t.nbytes for t, _c in tracks120)
    down120_enc = None  # from the first batched rep — no extra wire cost
    for r in range(reps120):
        for side in ((0, 1) if r % 2 == 0 else (1, 0)):
            # probes run immediately before BOTH sides: the wire's state is
            # conditioned by the immediately preceding transfer pattern (a
            # controlled on-chip A/B/C measured a probe-preceded run 1.4×
            # FASTER median than the identical unprobed run, 6/8 reps, while
            # an earlier capture showed the opposite sign) — so a probe
            # adjacent to only one side contaminates the A/B in an
            # unpredictable direction.  With no probes at all, batched vs
            # serial measured exactly 1.00 at this scale (both wire-bound).
            # The probes also BRACKET the batched side's ceiling (the next
            # side's pre-probe doubles as the post-probe; the capture's
            # last run falls back to its pre-probe): these runs are
            # seconds long — long enough for the phase to shift inside.
            plog.append((probe_up(), probe_down()))
            if side == 0:
                e_idx.append(len(plog) - 1)
                t0 = time.perf_counter()
                many120 = [serialize_encoded(e)
                           for e in enc.encode_many(tracks120)]
                dt = time.perf_counter() - t0
                e_t.append(dt)
                if down120_enc is None:
                    down120_enc = sum(len(b) for b in many120)
            else:
                t0 = time.perf_counter()
                ser120 = [serialize_encoded(enc.encode_pcm16(t, c))
                          for t, c in tracks120]
                s_t.append(time.perf_counter() - t0)
    e_ceils = [
        dur120 / float(np.mean([up120 / u + down120_enc / d
                                for u, d in plog[i : i + 2]]))
        for i in e_idx
    ]
    assert many120 == ser120, "segmented album encode must be bit-identical"
    vs120 = float(np.median([s_ / a for a, s_ in zip(e_t, s_t)]))
    emit(
        "album120_encode_realtime_factor_44k_stereo", dur120,
        min(e_t), float(np.median(e_t)),
        key="album120_enc", vs_serial=round(vs120, 2),
        **_ceiling_fields(e_t, e_ceils, dur120),
    )
    print(
        f"# album 4x120s stereo: batched {min(e_t)*1000:.0f} ms vs serial "
        f"{min(s_t)*1000:.0f} ms (median per-rep {vs120:.2f}x, "
        f"bit-identical; "
        + " ".join(f"{s_/a:.2f}x" for a, s_ in zip(e_t, s_t)) + ")",
        file=sys.stderr,
    )

    eas120 = enc.encode_many(tracks120)
    dec.decode_many(eas120)                           # warm segmented path
    [dec.decode_i16(ea) for ea in eas120]             # warm serial
    words120 = sum(_decode_upload_bytes(dec, ea) for ea in eas120)
    down120 = sum(
        (ea.frame_set.num_frames + 1) * dec.config.n
        * ea.header.channels * 2
        for ea in eas120
    )
    de_t, ds_t, d_idx, d_stats, dplog = [], [], [], [], []
    for r in range(reps120):                          # alternating A/B
        for side in ((0, 1) if r % 2 == 0 else (1, 0)):
            # probes before BOTH sides, bracketing the batched side's
            # ceiling — see the encode loop's note
            dplog.append((probe_up(), probe_down()))
            if side == 0:
                d_idx.append(len(dplog) - 1)
                stb: dict = {}
                t0 = time.perf_counter()
                outs_b120 = dec.decode_many(eas120, stats=stb)
                de_t.append(time.perf_counter() - t0)
                d_stats.append(stb)
            else:
                t0 = time.perf_counter()
                outs_s120 = [dec.decode_i16(ea) for ea in eas120]
                ds_t.append(time.perf_counter() - t0)
    d_floors = [
        float(np.mean([words120 / u + down120 / d
                       for u, d in dplog[i : i + 2]]))
        for i in d_idx
    ]
    d_ceils = [dur120 / f for f in d_floors]
    # protocol ceiling: ~48 transfers per rep (16 chunks x upload+pieces)
    # is ~1.4 s of per-call floors on a ~3 s fast-phase rep — the counted
    # floors beyond the probes' two (same model as the 60 s decode metric)
    d_ceils_fl = [
        dur120 / (f + max(0, st.get("up_n", 0) + st.get("down_n", 0) - 2)
                  * call_floor_s)
        for f, st in zip(d_floors, d_stats)
    ]
    for ob, os_ in zip(outs_b120, outs_s120):
        assert len(ob) == len(os_)
        assert int(np.abs(ob.astype(np.int32)
                          - os_.astype(np.int32)).max(initial=0)) <= 1
    vs_d120 = float(np.median([s_ / a for a, s_ in zip(de_t, ds_t)]))
    emit(
        "album120_decode_realtime_factor_44k_stereo", dur120,
        min(de_t), float(np.median(de_t)),
        key="album120_dec", vs_serial=round(vs_d120, 2),
        pct_of_protocol_ceiling=_pct_of(de_t, d_ceils_fl, dur120),
        **_ceiling_fields(de_t, d_ceils, dur120),
    )
    print(
        f"# album decode 4x120s stereo: batched {min(de_t)*1000:.0f} ms vs "
        f"serial {min(ds_t)*1000:.0f} ms (median per-rep {vs_d120:.2f}x, "
        f"<=1 LSB; "
        + " ".join(f"{s_/a:.2f}x" for a, s_ in zip(de_t, ds_t)) + ")",
        file=sys.stderr,
    )


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
    import jax.numpy as jnp

    from glc_tpu.ops.encode import encode_interleaved_device

    fs = encoded.frame_set
    max_row_nnz = int(fs.nnz.max()) if fs.nnz.size else 0
    print(
        f"# compaction: max per-(frame,channel) nnz = {max_row_nnz} "
        f"(mode {enc.config.compact_mode}: sort-free monotone binary lane "
        f"routing — 1.3 ms/rep on the shipped segment vs 3.1 for the "
        f"two-stage sort and ~27 for the legacy element scatter, "
        f"bit-identical; see CodecConfig.compact_mode)",
        file=sys.stderr,
    )

    tb = enc._tables
    tables = (tb.cos_table, tb.window, tb.norm, tb.band_mask,
              tb.band_inv_count, tb.band_pf, tb.band_of, tb.inv_w)
    # the SHIPPED segment geometry for this file (upload_geometry), not a
    # hardcoded 4096-frame program: the 60 s file's 2584 frames ladder to
    # a 2816-frame segment, and timing a 4096-frame program overstated the
    # shipped compaction's slot count by 45%
    from glc_tpu.codec.encoder import upload_geometry

    _t, _f, _pad, _plan, _need_hops, _tb_len = upload_geometry(
        len(samples), 2, enc.config)
    assert len(_plan) == 1, "60 s bench file should be a single segment"
    seg_k = _plan[0][1]
    budget = seg_k * 2 * 1024 // 8
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
    valid_frames = encoded.frame_set.num_frames  # real frames in the bucket
    run = lambda s: encode_interleaved_device(
        s, np.int32(0), np.int32(valid_frames), *tables, channels=2,
        lead=512, k_frames=seg_k, budget=budget, pad_hops=_need_hops,
        pcm16=True)

    def _forced_ms(fn) -> float:
        """fn(v) must return SMALL final handle(s) — slices/reductions
        taken AT DISPATCH, so the collect loop is pure downloads.  (A slice
        issued at collect time is a fresh dispatch and serializes ~29 ms of
        relay latency per call — measured, and it inflated an early r4
        capture by exactly that.)  With 8 pipelined calls this measures
        max(program time, per-call relay gap)."""
        np.asarray(fn(variants[0]))  # compile
        t0 = time.perf_counter()
        hs = [fn(v) for v in variants]
        for h in hs:
            np.asarray(h)
        return (time.perf_counter() - t0) / len(variants) * 1000.0

    @jax.jit
    def _tiny(x):
        return x[:1].astype(jnp.int32).sum()

    overhead_ms = _forced_ms(_tiny)        # the relay's per-call floor
    full_ms = _forced_ms(lambda v: run(v)[:1])

    # --- roofline split (VERDICT r3 item 5) via in-program repetition
    # SLOPES: the relay's ~29 ms per-call floor (overhead_ms) swamps any
    # single-shot probe of a sub-30 ms op, so each op runs N times inside
    # ONE jitted fori_loop and the marginal cost (t[N=9] − t[N=1]) / 8 is
    # the on-chip time.  scatter = the SHIPPED compaction
    # (compact_pairs_any, default grouped sort) on the real encoded q
    # (+ its ~1 ms perturb/reduce); mdct = the 43-GFLOP einsum (+ its
    # <0.5 ms consuming reduction — a sliced output would let XLA shrink
    # the very dot being timed).  Driver-visible JSON so "scatter-bound,
    # accepted" is a recorded measurement and an XLA scatter regression
    # shows up in the BENCH artifact.
    from functools import partial as _partial

    from glc_tpu.ops.encode import (
        _planarize_device,
        compact_pairs_any,
        encode_interleaved_dense_device,
        frames_from_signal,
    )
    from glc_tpu.ops.mdct import mdct as mdct_op

    dkw = dict(channels=2, lead=512, k_frames=seg_k, pad_hops=_need_hops,
               pcm16=True)
    q_d, nnz_d, _s_d, _u_d = encode_interleaved_dense_device(
        variants[0], np.int32(0), *tables, **dkw)
    # the shipped programs zero bucket-pad rows (frames ≥ valid) before
    # compacting — the dense fallback returns them unmasked, so mask here
    # or the slope times a garbage boundary frame the shipped compaction
    # never sees (measured: 772 kept pairs vs the real max of 353, enough
    # to push sort2 off its fast path)
    q_np = np.asarray(q_d).copy()
    nnz_np = np.asarray(nnz_d).copy()
    q_np[valid_frames:] = 0
    nnz_np[valid_frames:] = 0
    q_d = jax.device_put(q_np)
    nnz_d = jax.device_put(nnz_np)
    jax.block_until_ready(q_d)

    @_partial(jax.jit, static_argnames=("reps",))
    def scatter_slope(q, nnz, i0, *, reps):
        def body(i, acc):
            # perturb kept values so nothing hoists out of the loop; the
            # keep mask stays (almost) fixed, so the scatter workload does.
            # Times the SHIPPED compaction (config compact_mode), so a
            # default change shows up here automatically.
            qq = jnp.where(q != jnp.int16(0),
                           q + (i & 1).astype(jnp.int16), q)
            p = compact_pairs_any(qq, nnz, 1024, budget,
                                  enc.config.compact_mode,
                                  enc.config.compact_bb_mult)
            return acc + p.sum()
        return jax.lax.fori_loop(i0, i0 + reps, body, jnp.int32(0))

    @_partial(jax.jit, static_argnames=("reps",))
    def mdct_slope(x, i0, *, reps):
        xf = (_planarize_device(x, 2, 512, 1024, _need_hops)
              .astype(jnp.float32) / np.float32(32768.0))
        blocks = frames_from_signal(xf, 1024) * tb.window

        def body(i, acc):
            c = mdct_op(blocks + i.astype(jnp.float32) * np.float32(1e-9),
                        tb.cos_table, tb.norm)
            return acc + c.sum()
        return jax.lax.fori_loop(i0, i0 + reps, body, jnp.float32(0))

    _i0 = [0]

    def _timed_call(build, reps) -> float:
        _i0[0] += 7                        # distinct args defeat memoization
        t0 = time.perf_counter()
        np.asarray(build(np.int32(_i0[0]), reps))
        return (time.perf_counter() - t0) * 1000.0

    def _slope(build, lo=1, hi=9) -> float:
        _timed_call(build, lo)             # compile both shapes
        _timed_call(build, hi)
        t_lo = min(_timed_call(build, lo) for _ in range(2))
        t_hi = min(_timed_call(build, hi) for _ in range(2))
        return max((t_hi - t_lo) / (hi - lo), 0.0)

    scatter_ms = _slope(
        lambda i0, r: scatter_slope(q_d, nnz_d, i0, reps=r))
    mdct_ms = _slope(lambda i0, r: mdct_slope(variants[0], i0, reps=r))

    dt = full_ms / 1000.0
    enc_x = duration_s / dt
    print(
        json.dumps(
            {
                "metric": "encode_device_compute_realtime_factor_44k_stereo",
                "value": round(enc_x, 1),
                "unit": "x_realtime",
                "vs_baseline": round(enc_x / 500.0, 3),
                "scatter_ms": round(scatter_ms, 1),
                "mdct_ms": round(mdct_ms, 2),
                "overhead_ms": round(overhead_ms, 1),
            }
        )
    )
    print(
        f"# device-compute-only (forced, incl. dispatch+1-int download):"
        f" {full_ms:.2f} ms for {duration_s:.0f}s stereo = "
        f"{enc_x:.0f}x realtime on-chip (per-call relay floor "
        f"{overhead_ms:.1f} ms); roofline slopes: compaction scatter "
        f"{scatter_ms:.1f} ms/rep, MDCT einsum {mdct_ms:.2f} ms/rep — "
        f"the program is compaction+floor-bound, the MXU math is "
        f"~{100*mdct_ms/max(full_ms,1e-9):.0f}% of it",
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
    if valid == chunk:
        # keep one PAD flag slot free to perturb (frames beyond `valid`
        # are discarded by the host, so this doesn't change the program
        # cost — the chunk's static shape is unchanged)
        valid = chunk - 1
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
            w, zero_carry, np.int32(valid),
            tb.cos_table, tb.window, tb.norm,
            K=chunk, C=2, n=1024, budget=budget2, rbudget=rbudget,
            max_q=enc.config.max_q, window_raw=False, out_i16=True,
        )

    np.asarray(drun(carries[0])[0][:1])
    t0 = time.perf_counter()
    outs = [drun(w)[0][:1] for w in carries]
    for o in outs:
        np.asarray(o)
    ddt = (time.perf_counter() - t0) / len(carries)
    # ONE call decodes `valid` frames — valid·n/sr seconds of audio, NOT
    # the whole file: since decode_chunk_frames dropped to 1408 (r5) the
    # 60 s file is TWO chunks, and scaling a single-chunk call by the full
    # 60 s overstated dec_x ~1.8× (r5_run1/run2 artifacts).  The forced
    # per-call wall is also floor-bound (max(program, ~30 ms relay gap)
    # with 8 pipelined calls), so the pure program time comes from an
    # in-program repetition slope, same method as scatter/mdct: N chunk
    # decodes inside one fori_loop, marginal cost = on-chip time.
    sr = encoded.header.sample_rate
    dec_call_s = valid * 1024 / sr

    # perturb the LAST REAL pair's q low bit per iteration: the IMDCT
    # consumes the scatter of the kv section, so a real-pair perturbation
    # forces the whole decode to recompute every rep (a pad-slot xor
    # leaves the coefficient path loop-invariant and XLA may hoist it —
    # same reasoning as scatter_slope's kept-value perturb)
    kv_idx = max(int(fs.nnz[:valid].sum()) - 1, 0)

    @_partial(jax.jit, static_argnames=("reps",))
    def dec_slope(w, i0, *, reps):
        def body(i, acc):
            ww = w.at[kv_idx].set(w[kv_idx] ^ (i & 1))
            hops, _carry = drun(ww)
            return acc + hops.astype(jnp.int32).sum()
        return jax.lax.fori_loop(i0, i0 + reps, body, jnp.int32(0))

    dec_prog_ms = _slope(
        lambda i0, r: dec_slope(carries[0], i0, reps=r))
    dec_x = dec_call_s / (dec_prog_ms / 1000.0) if dec_prog_ms > 0 else 0.0
    print(
        f"# decode device-compute: forced per-call wall {ddt*1000:.2f} ms "
        f"for {dec_call_s:.1f}s of audio (floor-bound); in-program slope "
        f"{dec_prog_ms:.2f} ms/chunk-decode = {dec_x:.0f}x realtime "
        f"on-chip",
        file=sys.stderr,
    )
    SUMMARY["dev"] = {
        "enc_x": round(enc_x, 0), "dec_x": round(dec_x, 0),
        "dec_ms": round(dec_prog_ms, 2),
        "scatter_ms": round(scatter_ms, 1), "mdct_ms": round(mdct_ms, 2),
        "overhead_ms": round(overhead_ms, 1),
    }


if __name__ == "__main__":
    if "--longfile-child" in sys.argv:
        longfile_child()
    else:
        main()
