"""The driver captures only the last ~2000 chars of bench.py stdout and
parses the LAST line as the round artifact.  Round 3's final line carried
wall-sample / per-round-stage / host-probe arrays and blew past that
budget (BENCH_r03.json: rc=0, parsed=null).  These tests pin the fix:
bulky diagnostics go to BENCH/bench_side.json, the stdout line stays
under bench.LINE_BUDGET even with every query + scaling field present.
"""

import io
import json
import sys

import bench
import __spark_entry__ as entrymod


def _worst_case_result():
    # every registered query (plus headroom for future additions), full
    # scaling summary, all bulky diagnostics attached
    queries = {name: 123.456 for name in entrymod.queries()}
    for i in range(8):  # headroom: 8 more queries than exist today
        queries[f"future_query_with_a_long_name_{i}"] = 123.456
    return {
        "metric": "clips_per_sec_4n(dedup pipeline, N vs 4N cores)",
        "value": 368.86,
        "unit": "clips/sec",
        "queries": queries,
        "sf": 0.1,
        "total_query_sec": 61.21,
        "scaling_window_valid": True,
        "min_stream_gbps": 6.035,
        "n_clips": 16000,
        "cores_n": 1,
        "cores_4n": 4,
        "wall_sec_n": 140.6,
        "wall_sec_4n": 43.38,
        "clips_per_sec_n": 113.8,
        "clips_per_sec_4n": 368.86,
        "scaling_efficiency": 0.81,
        "scaling_efficiency_min_legs": 0.788,
        "scaling_efficiency_best_round": 1.085,
        "scaling_error": "x" * 300,
        # bulky diagnostics that must be diverted to the side file
        "wall_samples_n": [140.6, 188.23, 134.99] * 3,
        "wall_samples_4n": [42.8, 43.38, 68.56] * 3,
        "host_probes": [{"tasks_per_sec": 7384.07, "stream_gbps": 6.773}] * 9,
        "stage_ms_n": {s: 12345 for s in
                       ("exact_groups", "sketches", "candidates", "verified", "clusters")},
        "stage_ms_4n": {s: 12345 for s in
                        ("exact_groups", "sketches", "candidates", "verified", "clusters")},
        "stage_ms_rounds_n": [{s: 12345 for s in ("a", "b", "c", "d", "e")}] * 9,
        "stage_ms_rounds_4n": [{s: 12345 for s in ("a", "b", "c", "d", "e")}] * 9,
    }


def test_final_line_fits_driver_tail_capture(monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    bench.emit(_worst_case_result(), phase="final")
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1
    line = lines[0]
    assert len(line) < bench.LINE_BUDGET, (
        f"final artifact line is {len(line)} chars; driver tail capture is ~2000"
    )
    parsed = json.loads(line)
    # the driver contract fields survive the shrink
    assert parsed["scaling_efficiency"] == 0.81
    assert parsed["scaling_window_valid"] is True
    assert parsed["queries"]
    assert "metric" in parsed and "value" in parsed and "unit" in parsed
    # bulky keys are NOT on the line
    for k in bench._SIDE_KEYS:
        assert k not in parsed
    # ... but they are all in the side artifact
    side = json.load(open(tmp_path / "BENCH" / "bench_side.json"))
    for k in bench._SIDE_KEYS:
        assert k in side
    # and the kill-safe mirror file holds the same compact line
    assert json.loads(open(tmp_path / "_bench_partial.json").read()) == parsed


def test_emit_without_scaling_fields(monkeypatch, tmp_path):
    # queries-phase partials (no scaling keys yet) must also stay compact
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    r = {"metric": "m", "value": 1.0, "unit": "sec",
         "queries": {name: 12.345 for name in entrymod.queries()},
         "sf": 0.01, "total_query_sec": 9.9}
    bench.emit(r, phase="queries_32")
    line = buf.getvalue().strip()
    assert len(line) < bench.LINE_BUDGET
    json.loads(line)
