"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the end-to-end
parse→route pipeline throughput on a synthetic tokens table.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pipeline_rows_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "syslog_parse_rfc3164",
    "syslog_parse_rfc5424",
    "syslog_hourly_agg",
    "syslog_route_counts",
    "agg_lineitem_pricing",
    "join_broadcast_segment_revenue",
    "window_topk_orders",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "asof_join_event_rates",
    "text_quality_scores",
]

BENCH_ROWS = int(os.environ.get("SPARKLOG_BENCH_ROWS", "400000"))


def _force(df) -> None:
    """Execute the full plan without transferring results."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from sparklog.queries import REGISTRY
    from sparklog.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + Python workers once (excluded from timings)
    _force(REGISTRY["syslog_priority_split"][0](spark, sf_dir).limit(10))

    from sparklog.queries import release_caches

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name][0]
        best = float("inf")
        for _ in range(3):  # best-of-3: host timing variance is ~2-6x
            t0 = time.time()
            _force(fn(spark, sf_dir))
            best = min(best, time.time() - t0)
            # drop query-scoped persists so (a) storage memory does not
            # accumulate across the suite and (b) each rep pays the full
            # cost rather than hitting the previous rep's cache
            release_caches()
        timings[name] = round(best, 3)

    # end-to-end pipeline throughput (parsed-and-routed sequences/sec)
    from pyspark.sql import functions as F

    from sparklog.enrich import enrich
    from sparklog.fixtures import synth_lines, write_tokens_table
    from sparklog.pipeline import parse_stage
    from sparklog.route import salted_repartition, with_route_columns

    src_path = f"/tmp/sparklog_bench_src_{BENCH_ROWS}"
    if not os.path.exists(os.path.join(src_path, "_SUCCESS")):
        write_tokens_table(spark, synth_lines(BENCH_ROWS), src_path,
                           n_partitions=64)
    src = spark.read.parquet(src_path)
    routed = salted_repartition(
        with_route_columns(enrich(parse_stage(src), spark)), 64)
    pipe_sec = float("inf")
    for _ in range(3):
        t0 = time.time()
        _force(routed)
        pipe_sec = min(pipe_sec, time.time() - t0)
    timings["pipeline_parse_route"] = round(pipe_sec, 3)

    # per-run dedup observability (untimed): the cap-cascade metrics table
    # a production dedup invocation writes next to its outputs
    from sparklog.queries import dedup_path_metrics

    bucket_metrics = {r["path"]: {
        k: r[k] for k in ("n_rows", "n_buckets", "n_over_cap_buckets",
                          "n_refined_rows", "n_salted_rows",
                          "n_dropped_rows")}
        for r in dedup_path_metrics(spark, sf_dir).collect()}
    release_caches()

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "pipeline_rows": BENCH_ROWS,
        "pipeline_rows_per_sec": round(BENCH_ROWS / pipe_sec, 1),
        "dedup_bucket_metrics": bucket_metrics,
    }))


if __name__ == "__main__":
    main()
