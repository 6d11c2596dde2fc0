"""The driver-facing bench contract: bench.py must print exactly one
JSON line with the agreed keys, runnable at any sf dir."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_one_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        # contract shape check only — one run per query keeps the suite
        # fast; the driver's real invocation uses the median-of-3
        # default
        SPARK_GRAFT_BENCH_N="1",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout[-2000:]
    payload = json.loads(lines[-1])
    assert payload["unit"] == "sec"
    assert isinstance(payload["value"], (int, float)) and payload["value"] > 0
    assert payload["sf"] == 0.001
    assert payload["queries"] and all(v >= 0 for v in payload["queries"].values())
    assert payload["pipeline"]["triples"] > 0
    assert payload["pipeline"]["triples_per_sec"] > 0
    # raw per-run numbers for auditability (noise-proofing contract)
    assert set(payload["runs"]["queries"]) == set(payload["queries"])
    assert len(payload["runs"]["pipeline_sec"]) >= 1
