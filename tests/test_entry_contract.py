"""Pre-validate the driver contract: every queries() entry runs, and
every oracle_sql() entry produces the SAME multiset of rows in DuckDB
(sorted columns, stringified values — mirroring the driver's
order-insensitive value-hash compare)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert rows[0]["out_degree"] >= rows[-1]["out_degree"]


def test_queries_and_oracles_agree(spark, sf_dir, duck):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    failures = []
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        if name not in oracles:
            # rows-only check (matches the driver's weaker mode)
            assert rows is not None
            continue
        ocols = None
        try:
            res = duck.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # pragma: no cover
            failures.append((name, f"oracle error: {e}"))
            continue
        if sorted(cols) != sorted(ocols):
            failures.append((name, f"schema mismatch spark={sorted(cols)} duck={sorted(ocols)}"))
            continue
        got = _row_multiset(cols, rows)
        want = _row_multiset(ocols, orows)
        if got != want:
            diff_g = [r for r in got if r not in set(want)][:3]
            diff_w = [r for r in want if r not in set(got)][:3]
            failures.append(
                (name, f"values differ: n={len(got)}/{len(want)} spark_only={diff_g} duck_only={diff_w}")
            )
    assert not failures, "\n".join(f"{n}: {m}" for n, m in failures)
