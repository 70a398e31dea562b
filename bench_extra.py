"""Extra round-8 micro-benchmarks (guide §1.4: noop-sink isolation).

NOT part of the frozen driver bench contract (bench.py is the measured
artifact); numbers from here are cited in OPTIMIZATION_r08.md.

1. substring_windows_longdocs: the O(L^2) windowing fix (VERDICT r7 #1).
   Generates n_docs unique synthetic docs of n_words words each and times
   window generation + hashing with (a) the OLD expression — split(t,' ')
   referenced inside the transform lambda, re-split per window position —
   and (b) the NEW shape _substring_windows uses — words array
   materialized once below the Generate.  Short fixture docs hide the
   difference; 1,000-word docs are where real web pages live.

2. ivf_probe_isolated: ann_ivf_topk end-to-end under noop on the x100
   corpus (the suite's slowest query in r7), for before/after citation.

Usage: python bench_extra.py [longdocs|ivf] ...
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

W = 20


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _longdocs(spark, n_docs: int, n_words: int):
    """Deterministic unique docs: word ids differ per doc so no two docs
    collapse."""
    return spark.range(n_docs).select(
        F.col("id").alias("rep"),
        F.expr(f"array_join(transform(sequence(0, {n_words - 1}), "
               f"j -> concat('w', pmod(id * 131071 + j * 524287, 9973))), "
               "' ')").alias("t"))


OLD_WIN = (
    f"case when size(split(t, ' ')) >= {W} then "
    f"transform(sequence(0, size(split(t, ' ')) - {W}), "
    f"i -> struct(i as pos, md5(array_join(slice(split(t, ' '), "
    f"i + 1, {W}), chr(31))) as h)) else array() end")

NEW_WIN = (
    f"case when size(w) >= {W} then "
    f"transform(sequence(0, size(w) - {W}), "
    f"i -> struct(i as pos, md5(array_join(slice(w, "
    f"i + 1, {W}), chr(31))) as h)) else array() end")


def bench_longdocs(spark, n_docs=2000, n_words=1000, reps=2):
    docs = _longdocs(spark, n_docs, n_words)
    old = (docs.select("rep", F.explode(F.expr(OLD_WIN)).alias("x"))
               .select("rep", "x.pos", "x.h"))
    new = (docs.withColumn("w", F.split("t", " "))
               .select("rep", F.explode(F.expr(NEW_WIN)).alias("x"))
               .select("rep", "x.pos", "x.h"))
    out = {}
    for name, df in (("old_split_in_lambda", old),
                     ("new_materialized_words", new)):
        spark.sparkContext.setJobDescription(f"substr windows {name}")
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            _force(df)
            best = min(best, time.time() - t0)
        out[name] = round(best, 2)
    out["n_docs"], out["n_words"] = n_docs, n_words
    out["speedup"] = round(out["old_split_in_lambda"]
                           / out["new_materialized_words"], 1)
    return out


def bench_ivf(spark, sf_dir: str, reps=3):
    from sparklog.queries import ann_ivf_topk, release_caches

    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription("ann_ivf_topk isolated")
        t0 = time.time()
        _force(ann_ivf_topk(spark, sf_dir))
        best = min(best, time.time() - t0)
        release_caches()
    return {"ann_ivf_topk_sec": round(best, 2), "sf": sf_dir}


def main():
    import json

    from sparklog.session import get_spark

    which = sys.argv[1] if len(sys.argv) > 1 else "longdocs"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if which == "longdocs":
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
        n_words = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
        print(json.dumps(bench_longdocs(spark, n_docs, n_words)))
    elif which == "ivf":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparklog_sf10"
        print(json.dumps(bench_ivf(spark, sf_dir)))
    else:
        raise SystemExit(f"unknown benchmark {which!r}")


if __name__ == "__main__":
    main()
