"""Structured Streaming extension: the same parse -> enrich -> route ->
aggregate pipeline over a streaming tokens source.

The reference is a synchronous library (no streaming); this is the
pipeline-level extension the north rule's scale posture implies: watermarked
event-time windows for the per-sink aggregates, checkpointed state for
resume, and foreachBatch for fan-out sinks (exactly-once per epoch with the
same deterministic salting as the batch path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .grammar import ParseConfig
from .pipeline import parse_stage
from .route import with_route_columns

TOKENS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])


def read_token_stream(spark: SparkSession, src_dir: str,
                      max_files: int = 16) -> DataFrame:
    return (spark.readStream
            .schema(TOKENS_SCHEMA)
            .option("maxFilesPerTrigger", max_files)
            .parquet(src_dir))


def streaming_hourly_counts(stream: DataFrame,
                            cfg: ParseConfig | None = None,
                            watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window facility x severity counts.  Late rows
    beyond the watermark are dropped by Spark's state store — the streaming
    analogue of the batch hourly_counts."""
    parsed = parse_stage(stream, cfg)
    return (parsed
            .where(F.col("parse_error").isNull())
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("w"),
                     "facility", "severity")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("hour"), "facility", "severity",
                    "n_events"))


def start_streaming_job(spark: SparkSession, src_dir: str, out_dir: str,
                        checkpoint: str, cfg: ParseConfig | None = None):
    """Fan-out sink writer via foreachBatch: exactly-once-per-epoch writes
    partitioned by (epoch, rfc, sink_class), checkpointed for resume.

    Idempotence: each epoch writes under its own epoch=<id> partition with
    dynamic-partition OVERWRITE, so a failure between a partial write and
    the checkpoint commit is repaired by the replay overwriting exactly
    that epoch's partitions (a blind append would duplicate rows)."""
    from .enrich import enrich

    parsed = with_route_columns(
        enrich(parse_stage(read_token_stream(spark, src_dir), cfg), spark))

    def write_epoch(df: DataFrame, epoch_id: int) -> None:
        (df.withColumn("epoch", F.lit(epoch_id))
           .write.mode("overwrite")
           .option("partitionOverwriteMode", "dynamic")
           .partitionBy("epoch", "rfc", "sink_class")
           .parquet(f"{out_dir}/sinks"))

    return (parsed.writeStream
            .foreachBatch(write_epoch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def run_streaming_hourly_batch(spark: SparkSession, tokens_dir: str,
                               checkpoint: str,
                               cfg: ParseConfig | None = None,
                               name: str = "streaming_hourly_sink"):
    """Run the availableNow hourly-counts stream to completion and return
    the final windowed counts as a batch DataFrame (complete-mode memory
    sink, so windows still open at end-of-stream are included — the batch
    oracle sees every hour)."""
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    q = (streaming_hourly_counts(read_token_stream(spark, tokens_dir), cfg)
         .writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(name)
