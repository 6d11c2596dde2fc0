"""Deterministic content-derived identity.

The reference mints fresh uuid4 node IDs per run (reference:
utils/database.py:85,105), so re-running duplicates the graph. A
resumable pipeline needs idempotent materialization, so every node id
here is a pure function of its content coordinates: re-running any
stage produces byte-identical ids, and MERGE-like semantics become
``dropDuplicates`` + overwrite.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def node_id(*cols: Column | str) -> Column:
    """64-bit deterministic id from the given coordinate columns."""
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])


def bucket(col: Column | str, n_buckets: int = 32) -> Column:
    """Stable hash bucket for partitioned writes (Iceberg
    ``bucket(N, id)`` equivalent on plain parquet)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")
