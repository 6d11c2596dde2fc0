"""Per-round benchmark: headline queries + end-to-end KG pipeline.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "pipeline": {"n_pages": N, "triples": T, "sec": S,
                "triples_per_sec": T/S},
   "runs": {"queries": {name: [raw...]}, "pipeline_sec": [raw...]}}

- NOISE-PROOFING (round-2 verdict item 2): every query and the
  pipeline run $SPARK_GRAFT_BENCH_N times (default 3); the reported
  number is the per-key MEDIAN, and the raw per-run numbers are
  emitted under "runs" for auditability. One noisy run on a shared VM
  (±20% band, BASELINE.md) can no longer flip the round-over-round
  story.
- queries run against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
- the pipeline runs end-to-end (extract -> link -> canonicalize ->
  chunk -> summarize -> materialize) on a deterministic synthetic
  pages table sized to the SF, generated to parquet FIRST (input
  materialization is setup, not engine time)
- cores from $SPARK_GRAFT_CPUS (default 32)
- BENCH_QUERIES keeps the historical key names for round-over-round
  comparison; names retired from the gate registry by the round-3
  query consolidation resolve to their still-defined q_* functions.

Scaling evidence (north rule) is produced by bench_scaling.py and
recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from legal_knowledge_graph_spark.session import get_spark  # noqa: E402

#: headline operator queries (entry_queries names) timed per round
BENCH_QUERIES = [
    "split_intro_body",
    "mention_counts",
    "triple_extract",
    "entity_link",
    "cc_components",
    "tree_agg",
    "next_prev",
    "topk_cosine",
    "dedup_exact",
    "dedup_minhash",
    "simhash",
    "ngram_jaccard",
    "embedding_near_dup",
    "token_stats",
    "quality_score",
    "language_id",
    "fingerprint",
    "salted_degree",
    # round-1 additions (absent from BENCH_r01.queries — added so
    # round-over-round regressions on them are detectable)
    "rollup_agg",
    "ivf_ann",
    "bpe_tokens",
    # round-2 additions
    "tree_summarize",
    "align_spans",
    "toc_reshape",
    "ivf_ann_exact",
    "vector_attach",
    "simhash_near_dup",
    "dedup_groups",
    "structure_sequential",
    "sessionize",
    # round-3 additions
    "quality_filters",
    "contamination",
    # round-5 additions (round-4 operators previously timed only
    # inside merged gate entries — regressions were invisible)
    "lsh_ann_multi",
    "image_pixel_stats",
]

PAGES_PER_SF = 40_000  # sf0.1 -> 4,000 pages


def infer_sf(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = infer_sf(sf_dir)
    spark = get_spark(app_name="lkg-bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    from legal_knowledge_graph_spark import entry_queries
    from legal_knowledge_graph_spark.datagen import generate_pages
    from legal_knowledge_graph_spark.entry_queries import QUERIES
    from legal_knowledge_graph_spark.pipeline import run_pipeline

    n_runs = max(int(os.environ.get("SPARK_GRAFT_BENCH_N", "3")), 1)
    work = tempfile.mkdtemp(prefix="lkg_bench_")
    try:
        # ---- setup (untimed): materialize the input pages table
        n_pages = max(int(sf * PAGES_PER_SF), 200)
        pages_path = os.path.join(work, "pages")
        generate_pages(spark, n_pages).write.mode("overwrite").parquet(pages_path)
        pages = spark.read.parquet(pages_path)

        # ---- timed: end-to-end construction, n_runs times, median
        pipe_runs: list[float] = []
        n_triples = 0
        for i in range(n_runs):
            t0 = time.time()
            out = run_pipeline(spark, pages, os.path.join(work, f"kg{i}"))
            n_triples = out["triples"].count()
            out["edges"].count()  # force the last stage fully
            pipe_runs.append(round(time.time() - t0, 3))
        pipe_sec = statistics.median(pipe_runs)

        # ---- timed: headline queries, n_runs times each, median
        q_runs: dict[str, list[float]] = {n: [] for n in BENCH_QUERIES}
        for _ in range(n_runs):
            for name in BENCH_QUERIES:
                # original q_* functions first: gate entries merged by
                # the round-3 consolidation time a UNION of operators,
                # which would inflate shared-key comparisons vs earlier
                # rounds; the original per-operator functions stay
                # defined precisely for this.
                fn = getattr(entry_queries, f"q_{name}", None) or QUERIES[name]
                t0 = time.time()
                fn(spark, sf_dir).count()
                q_runs[name].append(round(time.time() - t0, 3))
        q_times = {n: round(statistics.median(r), 3) for n, r in q_runs.items()}

        total = round(pipe_sec + sum(q_times.values()), 3)
        print(
            json.dumps(
                {
                    "metric": "e2e_kg_pipeline_plus_headline_queries",
                    "value": total,
                    "unit": "sec",
                    "queries": q_times,
                    "sf": sf,
                    "pipeline": {
                        "n_pages": n_pages,
                        "triples": n_triples,
                        "sec": round(pipe_sec, 3),
                        "triples_per_sec": round(n_triples / pipe_sec, 2),
                    },
                    "runs": {"queries": q_runs, "pipeline_sec": pipe_runs},
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
