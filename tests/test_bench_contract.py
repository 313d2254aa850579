"""Headline-line contract for bench.py (round-4 verdict item 7).

The driver keeps only a bounded tail of bench stdout and json-parses the
LAST line into BENCH_r{N}.json. BENCH_r03 lost its artifact because one
giant JSON line outgrew that tail; the fix split detail into a sidecar
and left a compact headline — this test pins the guard that keeps it
that way: ``bench.validate_headline`` must accept exactly the line shape
``main`` prints and reject every regression class we have actually hit
(missing keys, oversized line, non-numeric timings, truncation).
"""

import json
import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _good() -> dict:
    return {
        "metric": "bench_total_wall",
        "value": 340.5,
        "unit": "sec",
        "queries": {"index_build": 18.7, "topk_wand": 10.3},
        "sf": 0.1,
        "n_pages": 200000,
        "index_docs_per_sec": 10694.9,
        "scaling_efficiency": 0.86,
    }


def test_valid_headline_round_trips():
    obj = bench.validate_headline(json.dumps(_good()))
    assert obj["metric"] == "bench_total_wall"
    assert obj["queries"]["index_build"] == 18.7


def test_missing_required_key_rejected():
    for key in bench.HEADLINE_REQUIRED_KEYS:
        bad = _good()
        del bad[key]
        with pytest.raises(ValueError, match="missing keys"):
            bench.validate_headline(json.dumps(bad))


def test_truncated_line_rejected():
    # the BENCH_r03 failure mode: driver tail cut the head of the line
    line = json.dumps(_good())
    with pytest.raises((ValueError, json.JSONDecodeError)):
        bench.validate_headline(line[len(line) // 2 :])


def test_oversized_headline_rejected():
    fat = _good()
    # a per-query leg explosion accidentally routed into the headline
    fat["queries"] = {f"q{i:04d}_leg": 1.0 for i in range(500)}
    line = json.dumps(fat)
    assert len(line.encode()) > bench.HEADLINE_MAX_BYTES
    with pytest.raises(ValueError, match="exceeds"):
        bench.validate_headline(line)


def test_non_numeric_timing_rejected():
    bad = _good()
    bad["queries"]["topk_wand"] = None  # a failed leg must not be silent
    with pytest.raises(ValueError, match="non-numeric"):
        bench.validate_headline(json.dumps(bad))


def test_nonpositive_total_rejected():
    bad = _good()
    bad["value"] = 0
    with pytest.raises(ValueError, match="non-positive"):
        bench.validate_headline(json.dumps(bad))


def test_wrong_metric_rejected():
    bad = _good()
    bad["metric"] = "bench_queries_detail"  # sidecar line is NOT the headline
    with pytest.raises(ValueError, match="unexpected metric"):
        bench.validate_headline(json.dumps(bad))


def test_current_main_headline_shape_matches_contract():
    """The keys main() actually emits (pinned here from the source) are a
    superset of the required set — if someone renames a key in main()
    without updating the contract, this fails without running Spark."""
    import inspect

    src = inspect.getsource(bench.main)
    for key in bench.HEADLINE_REQUIRED_KEYS:
        assert f'"{key}"' in src, f"main() no longer emits {key!r}"
    assert "validate_headline(headline)" in src
