"""Pin the bench stdout contract against the driver's tail window.

The round driver snapshots the LAST 2000 BYTES of bench.py's stdout
into BENCH_r{N}.json and json-parses what it finds there. r13's JSON
line outgrew the window (VERDICT r13 item 2: byte-truncated `tail`,
`parsed: null`, q1's timing unrecoverable). These tests build the
payload exactly as bench.main() does — every HEADLINE and TIER2 query
populated with worst-case-width values, both baseline ratio maps full —
and pin that emit_result() (a) always fits the window, (b) never drops
a raw timing, and (c) persists the complete payload to BENCH_FULL.json.
"""

from __future__ import annotations

import json

import bench


def _worst_case_payload() -> dict:
    # EVERY key bench.main() can emit, over the LIVE headline/tier-2
    # sets, with worst-case number widths (4-char integer parts are far
    # beyond any real run). r16's version of this test omitted the band
    # keys (tier2_vs_band/tier2_over_band/tier2_band_context) that the
    # real run emits, so it passed at 1897B while the real line was
    # 1903B and the driver runs crashed (VERDICT r16 item 1). Any new
    # key added to main()'s payload MUST be added here too — that is
    # what makes this test the contract.
    q = {name: 9999.999 for name in bench.HEADLINE}
    t2 = {name: 9999.999 for name in bench.TIER2}
    return {
        "metric": "headline_queries_total_wall",
        "value": 99999.999,
        "unit": "sec",
        "queries": q,
        "sf": 0.1,
        "calibration": {
            "probe_sec": 0.1306,
            "probe_ref_sec": bench.PROBE_REF_SEC,
            "host_factor": 1.004,
        },
        "value_probe_normalized": 99999.999,
        "queries_tier2": t2,
        "tier2_total": 9999.999,
        "tier2_vs_baseline": {name: 99.999 for name in bench.TIER2},
        "tier2_vs_baseline_total": 99.999,
        "tier2_vs_band": {
            name: {"vs_median": 99.999, "class": "under_floor"}
            for name in bench.TIER2
        },
        "tier2_over_band": sorted(bench.TIER2),
        "tier2_band_context": {
            "host_factor": 99.999,
            "quiet_probe": False,
            "escalate": False,
        },
        "vs_baseline": {name: 99.999 for name in bench.HEADLINE},
        "vs_baseline_total": 99.999,
    }


def test_worst_case_payload_covers_every_emitted_key():
    """Parse bench.main's source for the literal payload keys it writes
    (out = {...} plus out[...] = assignments) and require each to be in
    the worst-case payload — a new emit key that is not also added to
    _worst_case_payload() would make the budget test under-cover again
    exactly as in r16."""
    import ast
    import inspect

    tree = ast.parse(inspect.getsource(bench.main))
    emitted: set[str] = set()
    for node in ast.walk(tree):
        # out = { "k": ... }  (the initial payload literal)
        if isinstance(node, ast.Assign) and isinstance(node.value, ast.Dict):
            targets = [t.id for t in node.targets if isinstance(t, ast.Name)]
            if "out" in targets:
                emitted.update(
                    k.value for k in node.value.keys
                    if isinstance(k, ast.Constant) and isinstance(k.value, str)
                )
        # out["k"] = ...  (conditional additions)
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if (isinstance(t, ast.Subscript)
                        and isinstance(t.value, ast.Name)
                        and t.value.id == "out"
                        and isinstance(t.slice, ast.Constant)
                        and isinstance(t.slice.value, str)):
                    emitted.add(t.slice.value)
    assert emitted, "failed to find bench.main's payload keys"
    missing = emitted - set(_worst_case_payload())
    assert not missing, (
        f"bench.main emits keys not covered by the worst-case budget "
        f"test: {sorted(missing)} — add them to _worst_case_payload() "
        f"(and to _DROPPABLE if the line no longer fits)"
    )


def test_stdout_line_fits_driver_tail_window(tmp_path):
    out = _worst_case_payload()
    line = bench.emit_result(out, str(tmp_path))
    assert len(line) <= bench.STDOUT_BUDGET, (
        f"bench stdout line is {len(line)} bytes > {bench.STDOUT_BUDGET}; "
        "the driver's 2000-byte tail would truncate it (the r13 failure). "
        "Trim the payload or extend _DROPPABLE — never the raw timings."
    )
    parsed = json.loads(line)
    # every timed query's raw seconds must survive, q1 included
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert set(parsed["queries_tier2"]) == set(bench.TIER2)
    for key in ("metric", "value", "unit", "sf", "calibration",
                "vs_baseline_total", "tier2_vs_baseline_total"):
        assert key in parsed, key
    assert parsed["full"] == "BENCH_FULL.json"


def test_full_payload_persisted_lossless(tmp_path):
    out = _worst_case_payload()
    bench.emit_result(out, str(tmp_path))
    full = json.loads((tmp_path / "BENCH_FULL.json").read_text())
    assert full == out  # ratio maps dropped from stdout live here


def test_small_payload_passes_through_untrimmed(tmp_path):
    out = {"metric": "m", "value": 1.0, "unit": "sec",
           "queries": {"q1_net_revenue_by_nation": 0.5}, "sf": 0.1,
           "vs_baseline": {"q1_net_revenue_by_nation": 0.25}}
    parsed = json.loads(bench.emit_result(out, str(tmp_path)))
    assert parsed["vs_baseline"] == {"q1_net_revenue_by_nation": 0.25}


def test_oversized_line_fails_loudly_at_bench_time(tmp_path):
    """r14 ADVICE: if the payload exceeds the driver window even after
    every droppable key is gone, emit_result must RAISE — returning
    the oversized line would let the driver's 2000-byte tail produce
    a silently-truncated artifact at runtime. The full payload still
    lands on disk before the raise."""
    import pytest

    out = _worst_case_payload()
    out["queries"]["x_pad"] = "y" * (bench.STDOUT_BUDGET + 1)
    with pytest.raises(RuntimeError, match="driver window"):
        bench.emit_result(out, str(tmp_path))
    full = json.loads((tmp_path / "BENCH_FULL.json").read_text())
    assert full == out


def test_artifact_names_normalize_equivalent_dir_spellings(tmp_path):
    """r14 ADVICE: a symlinked/relative/trailing-slash spelling of the
    default sf dir must write the CANONICAL artifact name — the
    gen_scale_step bench_totals fold only reads the canonical names."""
    import os

    from tools.localcheck import artifact_suffix

    for spelling in (
        bench.DEFAULT_SF_DIR,
        bench.DEFAULT_SF_DIR + "/",
        "/root/testdata/../testdata/sf0.1",
    ):
        assert bench.bench_artifact_name(spelling) == "BENCH_FULL.json"
    link = tmp_path / "sf_default_link"
    os.symlink(bench.DEFAULT_SF_DIR, link)
    assert bench.bench_artifact_name(str(link)) == "BENCH_FULL.json"
    assert bench.bench_artifact_name("/root/testdata/sf1") == \
        "BENCH_FULL_sf1.json"

    from tools import localcheck

    for spelling in (
        localcheck.DEFAULT_SF_DIR,
        localcheck.DEFAULT_SF_DIR + "/",
        "/root/testdata/../testdata/sf0.01",
    ):
        assert artifact_suffix(spelling) == ""
    link2 = tmp_path / "sf_localcheck_link"
    os.symlink(localcheck.DEFAULT_SF_DIR, link2)
    assert artifact_suffix(str(link2)) == ""
    assert artifact_suffix("/root/testdata/sf0.1") == "_sf01"
    assert artifact_suffix("/root/testdata/sf1/") == "_sf1"
