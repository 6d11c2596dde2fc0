"""Generate an sf1.0-SHAPED measurement dataset (bench_extra only).

The driver's round-end bench escalated to a driver-generated sf1.0 dir
(BENCH_r05.json: "sf": 1.0, pipeline n_pages=40000). We cannot read
that generator, so this mimics the OBSERVABLE distributions of
/root/testdata/sf{0.001,0.01,0.1} at 10x sf0.1 scale:

- documents: 10x rows, SAME 31-word vocab / 10..100-word salads /
  20 sources (source count is FIXED across sf in the driver data, so
  per-source block sizes grow linearly -> blocked pair counts grow
  quadratically),
- embeddings: 10x rows, dim 64, 10 planted unit-vector clusters,
- events: 10x rows over the same 30-day window, 10x users,
- lineitem: 10x rows, orderkey space 10x (≈4 lines/order),
- tiny dims (nation/region/...) copied verbatim from sf0.1.

Output defaults to /root/work/sf1.0. NEVER writes into /root/testdata
(read-only driver data). Used only by bench_extra.py for driver-scale
profiling; the frozen bench.py and the oracles are untouched.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pandas as pd

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen_documents(rng: np.random.Generator, n: int) -> pd.DataFrame:
    n_words = rng.integers(10, 101, size=n)
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), size=w)]) for w in n_words]
    # plant exact-dup pairs at the sf0.1 observed rate (~8 groups / 5k docs)
    for i in rng.choice(n - 1, size=max(n // 625, 1), replace=False):
        texts[i + 1] = texts[i]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "text": texts,
            "lang": rng.choice(LANGS, size=n, p=LANG_P),
            "source": [f"src{i % 20}" for i in range(n)],
            "n_chars": np.array([len(t) for t in texts], dtype="int64"),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64) -> pd.DataFrame:
    centroids = rng.standard_normal((10, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    labels = rng.integers(0, 10, size=n)
    vecs = centroids[labels] + 0.9 * rng.standard_normal((n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": list(vecs.astype("float32")),
            "label": labels.astype("int32"),
        }
    )


def gen_events(rng: np.random.Generator, n: int) -> pd.DataFrame:
    span_us = 30 * 86400 * 1_000_000
    ts = np.sort(rng.integers(0, span_us, size=n)) + np.datetime64(
        "2024-01-01", "us"
    ).astype("int64")
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts.astype("datetime64[us]"),
            "user_id": rng.integers(0, n // 67, size=n).astype("int64"),
            "event_type": rng.choice(
                ["view", "click", "purchase", "signup", "error"], size=n
            ),
            "value": np.round(rng.uniform(0, 560, size=n), 2),
            "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n)],
        }
    )


def gen_lineitem(rng: np.random.Generator, n: int) -> pd.DataFrame:
    n_orders = n // 4
    return pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, n_orders, size=n).astype("int64"),
            "l_partkey": rng.integers(0, n // 3, size=n).astype("int64"),
            "l_suppkey": rng.integers(0, n // 600, size=n).astype("int64"),
            "l_linenumber": rng.integers(1, 8, size=n).astype("int32"),
            "l_quantity": rng.integers(1, 51, size=n).astype("float64"),
            "l_extendedprice": np.round(rng.uniform(900, 100000, size=n), 2),
            "l_discount": np.round(rng.integers(0, 11, size=n) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, size=n) / 100.0, 2),
            "l_returnflag": rng.choice(["N", "A", "R"], size=n),
            "l_linestatus": rng.choice(["O", "F"], size=n),
            "l_shipdate": (
                rng.integers(0, 2500, size=n) * np.timedelta64(86400, "s")
                + np.datetime64("1995-01-02", "us")
            ),
        }
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/work/sf1.0"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    assert not out.startswith("/root/testdata"), "testdata is read-only"
    os.makedirs(out, exist_ok=True)
    mult = sf / 0.1  # relative to sf0.1 observed sizes
    rng = np.random.default_rng(606)
    gen_documents(rng, int(5000 * mult)).to_parquet(f"{out}/documents.parquet")
    gen_embeddings(rng, int(2000 * mult)).to_parquet(f"{out}/embeddings.parquet")
    gen_events(rng, int(100000 * mult)).to_parquet(f"{out}/events.parquet")
    gen_lineitem(rng, int(600000 * mult)).to_parquet(f"{out}/lineitem.parquet")
    for t in ("nation", "region", "customer", "supplier", "part", "orders"):
        shutil.copy(f"/root/testdata/sf0.1/{t}.parquet", f"{out}/{t}.parquet")
    print(f"wrote {out} (sf={sf})")


if __name__ == "__main__":
    main()
