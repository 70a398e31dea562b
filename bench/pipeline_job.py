"""spark-submit job: end-to-end parse -> enrich -> route -> salted
repartition over a tokens table; prints one JSON line with throughput.

Submitted via ``spark-submit --py-files sparklog.zip bench/pipeline_job.py
--master local[N] --src <tokens parquet>`` — the multi-executor submission
shape from the north rule, evidenced at two parallelism levels.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from sparklog.enrich import enrich
    from sparklog.pipeline import parse_stage
    from sparklog.route import salted_repartition, with_route_columns

    src = spark.read.parquet(args.src)
    n_rows = src.count()
    routed = salted_repartition(
        with_route_columns(enrich(parse_stage(src), spark)),
        spark.sparkContext.defaultParallelism * 2)

    best = float("inf")
    for _ in range(args.runs):
        t0 = time.time()
        routed.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)

    print(json.dumps({
        "master": spark.sparkContext.master,
        "rows": n_rows,
        "best_sec": round(best, 2),
        "rows_per_sec": round(n_rows / best, 1),
    }))


if __name__ == "__main__":
    main()
