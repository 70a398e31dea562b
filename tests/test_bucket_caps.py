"""Degenerate-corpus guard: LSH band/bucket self-joins must stay bounded
when every document (or vector) collides into one bucket — the failure mode
a boilerplate-heavy 100 TB corpus hits.  With the cap, fan-out is at most
cap*(cap-1)/2 per bucket; an uncapped join would be O(N^2) on the hot key.
"""

import pytest
from pyspark.sql import functions as F

from sparklog.queries import (
    _cap_buckets,
    ann_lsh_candidate_pairs,
    dedup_minhash_lsh,
)


@pytest.fixture(scope="module")
def degenerate_docs_dir(spark, tmp_path_factory):
    """200 identical documents: every MinHash band is the same bucket."""
    d = str(tmp_path_factory.mktemp("degen"))
    (spark.range(200)
     .select(F.col("id").alias("doc_id"),
             F.lit("the same boilerplate text repeated for every single "
                   "document in this corpus").alias("text"),
             F.lit("en").alias("lang"), F.lit("web").alias("source"))
     .write.mode("overwrite").parquet(f"{d}/documents.parquet"))
    (spark.range(200)
     .select(F.col("id").alias("vec_id"),
             F.expr("transform(sequence(1, 64), i -> cast(0.5 as float))")
              .alias("embedding"))
     .write.mode("overwrite").parquet(f"{d}/embeddings.parquet"))
    return d


def test_minhash_bucket_cap_bounds_fanout(spark, degenerate_docs_dir):
    # uncapped: all 200 docs share both bands -> 200*199/2 pairs
    unbounded = dedup_minhash_lsh(spark, degenerate_docs_dir,
                                  bucket_cap=10**9).count()
    assert unbounded == 200 * 199 // 2
    # capped: the degenerate bucket is dropped entirely
    assert dedup_minhash_lsh(spark, degenerate_docs_dir,
                             bucket_cap=100).count() == 0


def test_ann_bucket_cap_bounds_fanout(spark, degenerate_docs_dir):
    unbounded = ann_lsh_candidate_pairs(spark, degenerate_docs_dir,
                                        bucket_cap=10**9).count()
    assert unbounded == 200 * 199 // 2
    assert ann_lsh_candidate_pairs(spark, degenerate_docs_dir,
                                   bucket_cap=100).count() == 0


def test_cap_keeps_small_buckets(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(5)] + [("b", i) for i in range(50)],
        "band string, doc_id int")
    kept = _cap_buckets(df, "band", 10)
    assert kept.where(F.col("band") == "a").count() == 5
    assert kept.where(F.col("band") == "b").count() == 0
