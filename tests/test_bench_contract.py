"""bench.py artifact contract.

The driver that records BENCH artifacts keeps only the LAST ~2000 chars of
bench output and parses the LAST {"metric": ...} JSON line.  bench.py's
contract (its module docstring, "ARTIFACT CONTRACT") is therefore: the final
printed line is the flagship encode-e2e metric with a compact `summary`
field carrying every other metric, and it must stay < 1500 chars so future
metric additions can never push the flagship number out of the tail again
(which is exactly what happened to the round-3 artifact).

These tests pin that with representative — deliberately padded — data.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def _representative_summary():
    """Every summary key bench can emit, with worst-case-width values."""
    return {
        "long600": {"x": 8888.8, "pct_adj": 100.0, "ceil_fl": 100.0,
                    "runs": [8888.8, 8888.8, 8888.8, 8888.8], "fresh": True},
        "decode": {"x": 8888.8, "med": 8888.8, "ceil_pct": 100.0,
                   "cp": [888, 888], "ceil_fl": 100.0,
                   "st": [888, 888, 888]},
        "flac": {"x": 8888.8, "med": 8888.8, "ceil_pct": 100.0,
                 "cp": [888, 888], "ceil_fl": 100.0},
        "album_enc": {"x": 8888.8, "med": 8888.8, "vs_serial": 88.88},
        "album_dec": {"x": 8888.8, "med": 8888.8, "vs_serial": 88.88},
        "album120_enc": {"x": 8888.8, "med": 8888.8, "vs_serial": 88.88,
                         "ceil_pct": 100.0, "cp": [888, 888]},
        "album120_dec": {"x": 8888.8, "med": 8888.8, "vs_serial": 88.88,
                         "ceil_pct": 100.0, "cp": [888, 888],
                         "ceil_fl": 100.0},
        "dev": {"enc_x": 88888.0, "dec_x": 88888.0, "dec_ms": 888.88,
                "scatter_ms": 888.8, "mdct_ms": 88.88,
                "overhead_ms": 888.8},
        "quality": {"compat_snr": -88.8, "clean_snr": 88.8,
                    "compat_maxerr_pct": 888.8, "clean_maxerr_pct": 88.8},
    }


def _representative_flagship():
    return {
        "metric": "encode_realtime_factor_44k_stereo",
        "value": 8888.8,
        "unit": "x_realtime",
        "vs_baseline": 88.888,
        "median_value": 8888.8,
        "link_ceiling_x_realtime": 8888.8,
        "pct_of_link_ceiling": 100.0,
        "pct_of_link_ceiling_best_run": 100.0,
        "pct_of_link_ceiling_range": [888, 888],
        "pct_of_protocol_ceiling": 100.0,
    }


def test_final_line_under_tail_budget():
    s = bench._build_final_line(_representative_flagship(),
                                _representative_summary())
    assert len(s) < 1500, f"final line {len(s)} chars >= 1500 budget"


def test_final_line_is_flagship_metric():
    s = bench._build_final_line(_representative_flagship(),
                                _representative_summary())
    d = json.loads(s)
    # the driver's `parsed` takes metric/value/unit/vs_baseline from the
    # last JSON line — these must be the flagship encode-e2e fields
    assert d["metric"] == "encode_realtime_factor_44k_stereo"
    assert d["unit"] == "x_realtime"
    assert "pct_of_link_ceiling" in d
    assert set(d["summary"]) == set(_representative_summary())


def test_final_line_single_line():
    s = bench._build_final_line(_representative_flagship(),
                                _representative_summary())
    assert "\n" not in s


def test_oversize_summary_sheds_runs_not_flagship():
    """If the summary ever bloats past the budget, the guard drops verbose
    sub-keys (runs lists) instead of growing the line."""
    summary = _representative_summary()
    summary["long600"]["runs"] = [8888.8] * 200  # pathological
    s = bench._build_final_line(_representative_flagship(), summary)
    d = json.loads(s)
    assert len(s) < 1500
    assert d["metric"] == "encode_realtime_factor_44k_stereo"
    assert "runs" not in d["summary"]["long600"]


def test_pathological_summary_never_breaks_flagship():
    """The guard ladder's last rungs: wide non-runs payloads force whole
    summary entries (then the summary itself) to be shed — the flagship
    metric dict must survive intact at ANY summary size."""
    summary = _representative_summary()
    for i in range(60):  # many future metrics, each with wide payloads
        summary[f"future_metric_{i}"] = {"x": 8888.8, "med": 8888.8,
                                         "note": "y" * 40}
    s = bench._build_final_line(_representative_flagship(), summary)
    d = json.loads(s)
    assert len(s) < 1500
    assert d["metric"] == "encode_realtime_factor_44k_stereo"
    assert d["pct_of_link_ceiling"] == 100.0


def test_pct_of_median_share():
    """_pct_of pairs each run with ITS OWN ceiling and takes the median of
    the per-run shares (not best-time over best-ceiling)."""
    # 60 s achieved in 0.5 s = 120x; ceilings 120/240/120x → shares
    # 100/50/100 → median 100.0
    assert bench._pct_of([0.5, 0.5, 0.5], [120.0, 240.0, 120.0], 60.0) == 100.0
    # a single run pairs with its single ceiling
    assert bench._pct_of([0.6], [50.0], 60.0) == 200.0


def test_emit_records_summary_keys():
    bench.SUMMARY.clear()
    line = bench.emit("decode_realtime_factor_44k_stereo", 60.0, 0.3, 0.32,
                      key="decode", pct_of_link_ceiling=87.5,
                      link_ceiling_x_realtime=229.0,
                      pct_of_link_ceiling_best_run=95.0)
    assert line["value"] == 200.0
    assert bench.SUMMARY["decode"] == {
        "x": 200.0, "med": 187.5, "ceil_pct": 87.5}
    bench.SUMMARY.clear()


class _FakeCompleted:
    def __init__(self, rc, out="", err=""):
        self.returncode = rc
        self.stdout = out
        self.stderr = err


def test_claim_probe_retries_through_outage(monkeypatch):
    """A hung/failed pool probe retries (killable child, bounded wait) and
    the direct claim runs only after a probe succeeds."""
    import subprocess

    calls = {"probe": 0}

    def fake_run(cmd, **kw):
        calls["probe"] += 1
        assert kw.get("timeout") is not None  # hung claims must be bounded
        if calls["probe"] == 1:
            raise subprocess.TimeoutExpired(cmd, kw["timeout"])
        if calls["probe"] == 2:
            return _FakeCompleted(1, err="UNAVAILABLE: pool empty")
        return _FakeCompleted(0, out="CLAIM_OK\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    import types

    fake_jax = types.SimpleNamespace(
        device_put=lambda x: x, block_until_ready=lambda x: x
    )
    monkeypatch.setitem(sys.modules, "jax", fake_jax)
    try:
        bench._claim_chip_with_retry(minutes=5.0)
    finally:
        sys.modules.pop("jax", None)
    assert calls["probe"] == 3


def test_claim_outage_exhausts_budget_with_reason(monkeypatch):
    """When the pool outlasts the retry budget the error names the last
    probe failure (the bench main() turns this into an explicit artifact
    line — value 0 + error field, never a fabricated number)."""
    import subprocess

    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    clock = {"t": 0.0}

    def fake_monotonic():
        clock["t"] += 120.0
        return clock["t"]

    monkeypatch.setattr(bench.time, "monotonic", fake_monotonic)
    import pytest

    with pytest.raises(RuntimeError, match="claim hanging"):
        bench._claim_chip_with_retry(minutes=5.0)
