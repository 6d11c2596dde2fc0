"""Round-6 measurement harness (guide §1): per-query noop-sink timing.

bench.py is FROZEN for driver measurement; this file exists for the
optimization loop only:

- times any subset of the bench/registry queries with the noop sink
  (computes every column, no .count() column pruning — guide §1.4),
- labels jobs (guide §1.5) so the UI/event log maps stages to queries,
- dumps .explain("formatted") per query (plans/r06/<q>_<suffix>.txt).

Usage:
  python bench_extra.py --sf-dir /root/work/sf1.0 --reps 3 \
      --queries ngram_jaccard,dedup_minhash [--explain plans/r06 --suffix before]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from legal_knowledge_graph_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default="")
    ap.add_argument("--explain", default="", help="dir to write explain files")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sink", choices=["noop", "count"], default="noop",
                    help="count matches frozen bench.py's action for A/B parity")
    args = ap.parse_args()

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="lkg-bench-extra", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    from legal_knowledge_graph_spark import entry_queries
    from legal_knowledge_graph_spark.entry_queries import QUERIES

    import bench

    names = [q for q in args.queries.split(",") if q] or bench.BENCH_QUERIES
    times: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            fn = getattr(entry_queries, f"q_{name}", None) or QUERIES[name]
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            if rep == 0 and args.explain:
                os.makedirs(args.explain, exist_ok=True)
                jvm = spark.sparkContext._jvm
                txt = jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(f"{args.explain}/{name}_{args.suffix}.txt", "w") as f:
                    f.write(txt)
    med = {n: round(statistics.median(r), 3) for n, r in times.items()}
    print(json.dumps({"sf_dir": args.sf_dir, "sink": args.sink,
                      "median": med, "runs": times,
                      "total_median": round(sum(med.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
