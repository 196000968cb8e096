"""Bench output-contract tests (no Spark needed).

The driver parses bench.py's LAST stdout line; a run where any query
errored must carry ``"incomplete": true`` on BOTH lines so a partial
total can never read as a perf win (VERDICT r6 item 3).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_incomplete_marker_on_forced_error():
    detail, compact = bench.assemble_lines(
        timings={"q1": 1.0, "q2": 2.0},
        errors={"q3": "AnalysisException: boom"},
        retried=[],
        retry_samples={},
        prebuild={},
        prebuild_errors={},
        sf=0.1,
    )
    assert detail["incomplete"] is True
    assert compact["incomplete"] is True
    assert compact["errors"] == 1
    # the partial total still sums ONLY successes (3.0), flagged as such
    assert compact["value"] == 3.0
    json.dumps(detail), json.dumps(compact)  # both JSON-serializable


def test_clean_run_has_no_incomplete_marker():
    detail, compact = bench.assemble_lines(
        timings={"q1": 1.5},
        errors={},
        retried=["q1"],
        retry_samples={"q1": [4.0, 1.5, 1.6]},
        prebuild={"stream_inputs": 2.0},
        prebuild_errors={},
        sf=0.01,
    )
    assert "incomplete" not in detail
    assert "incomplete" not in compact
    assert compact["value"] == 1.5
    # compact stays short: no per-query dict (bounded driver tail)
    assert "queries" not in compact
