"""Routing: severity-class fan-out with deterministic salted repartitioning
plus the token-array equality audit.

Hostname/source distributions are Zipf-skewed at scale; writing
``partitionBy(rfc, severity_class)`` without salting funnels hot sinks
through few tasks.  We salt with ``pmod(xxhash64(doc_id), S)`` —
deterministic (no rand()) so a resumed run reproduces byte-identical
partitioning, which keeps the manifest/resume layer idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEAD_LETTER_CLASS = "dead"


def with_route_columns(df: DataFrame) -> DataFrame:
    """sink key = (rfc, severity_class); parse failures route to 'dead'."""
    return df.withColumn(
        "sink_class",
        F.when(F.col("parse_error").isNotNull(), F.lit(DEAD_LETTER_CLASS))
         .otherwise(F.col("severity_class")),
    )


def salted_repartition(df: DataFrame, num_partitions: int,
                       salt_buckets: int = 16) -> DataFrame:
    """Co-partition by sink key + deterministic salt to split hot sinks."""
    return df.repartition(
        num_partitions,
        F.col("rfc"), F.col("sink_class"),
        F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets)),
    )


def write_sinks(df: DataFrame, out_dir: str, num_partitions: int = 32,
                salt_buckets: int = 16) -> None:
    """Single-pass fan-out: one write partitioned by sink key.

    At cluster scale this is one shuffle (the salted repartition) followed
    by a dynamic-partition write; no N-pass filtered rewrites of the fact
    table.
    """
    (salted_repartition(df, num_partitions, salt_buckets)
     .write.mode("overwrite")
     .partitionBy("rfc", "sink_class")
     .parquet(out_dir))


def audit_token_equality(routed: DataFrame, source: DataFrame) -> int:
    """North-rule invariant: every routed row's token array equals its
    source row's.  The routed side carries the decoded ``raw`` string (the
    token array never crosses the Arrow boundary outbound — see
    parse_stage); the source side is decoded by a string-only mapInArrow
    pass.  Because the token codec is bijective (codepoint<->int), string
    equality IS token-array equality.  One full-outer join on doc_id
    computes mismatched, dropped (source-only), and extra (routed-only)
    rows together — a single shuffle of each side instead of the three a
    separate inner+2x-anti formulation costs.  Returns the violation count
    (must be 0)."""
    from .udfs import DECODED_SCHEMA, make_decoder_fn

    r = routed.select("doc_id", F.col("raw").alias("routed_raw"))
    s = (source.select("doc_id", "tokens")
               .mapInArrow(make_decoder_fn(), DECODED_SCHEMA)
               .select("doc_id", F.col("raw").alias("src_raw")))
    j = r.join(s, "doc_id", "full_outer")
    violation = (F.col("routed_raw").isNull()           # dropped
                 | F.col("src_raw").isNull()            # extra
                 | ~(F.col("routed_raw") == F.col("src_raw")))
    return j.where(violation).count()
