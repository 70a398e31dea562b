"""Structured Streaming extension tests: watermarked windowed counts match
the batch aggregates, and the foreachBatch fan-out resumes from its
checkpoint without reprocessing."""

import glob
import os

from pyspark.sql import functions as F

from sparklog import fixtures
from sparklog.aggregate import hourly_counts
from sparklog.pipeline import parse_stage
from sparklog.streaming import (
    read_token_stream,
    start_streaming_job,
    streaming_hourly_counts,
)


def _write_tokens(spark, tmp_path, name, n, seed):
    path = str(tmp_path / name)
    fixtures.write_tokens_table(spark, fixtures.synth_lines(n, seed=seed),
                                path, n_partitions=2)
    return path


def test_streaming_counts_match_batch(spark, tmp_path):
    src = _write_tokens(spark, tmp_path, "src", 2000, seed=9)
    agg = streaming_hourly_counts(read_token_stream(spark, src))
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName("stream_counts")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = (spark.sql("SELECT facility, severity, sum(n_events) AS n "
                     "FROM stream_counts GROUP BY 1, 2")
           .toPandas().sort_values(["facility", "severity"])
           .reset_index(drop=True))
    batch = (hourly_counts(
                parse_stage(spark.read.parquet(src))
                .withColumn("sink_class", F.lit("x")))
             .groupBy("facility", "severity")
             .agg(F.sum("n_events").alias("n"))
             .toPandas().sort_values(["facility", "severity"])
             .reset_index(drop=True))
    assert len(got) == len(batch)
    assert (got["n"].to_numpy() == batch["n"].to_numpy()).all()


def test_streaming_checkpoint_resume(spark, tmp_path):
    src_dir = str(tmp_path / "stream_src")
    os.makedirs(src_dir)
    out_dir = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")

    # epoch 1
    fixtures.write_tokens_table(spark, fixtures.synth_lines(500, seed=1),
                                src_dir + "/batch1", n_partitions=1)
    for f in glob.glob(src_dir + "/batch1/*.parquet"):
        os.rename(f, src_dir + "/" + os.path.basename(f))
    q = start_streaming_job(spark, src_dir, out_dir, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir + "/sinks").count()
    assert n1 == 500

    # restart with the same checkpoint: nothing new -> no growth
    q = start_streaming_job(spark, src_dir, out_dir, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out_dir + "/sinks").count() == 500

    # new file arrives -> only the delta is processed
    pdf = fixtures.synth_lines(300, seed=2)
    pdf["doc_id"] = "b2-" + pdf["doc_id"]
    fixtures.write_tokens_table(spark, pdf, src_dir + "/batch2",
                                n_partitions=1)
    for f in glob.glob(src_dir + "/batch2/*.parquet"):
        os.rename(f, src_dir + "/2_" + os.path.basename(f))
    q = start_streaming_job(spark, src_dir, out_dir, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out_dir + "/sinks").count() == 800


def test_user_state_parquet_sink_matches_batch_and_replays(spark,
                                                           tmp_path):
    """Production-shape stateful sink (run_user_state_job: foreachBatch ->
    epoch-partitioned parquet): final per-user rows must equal the batch
    GROUP BY, and a crash-replay of the last epoch must overwrite, not
    duplicate (same recipe as the fan-out sink test)."""
    from sparklog.streaming import run_user_state_job

    ev_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "us_out")
    ckpt = str(tmp_path / "us_ckpt")
    events = spark.range(300).select(
        (F.col("id") % 25).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 5)).alias("event_type"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60)
         .alias("ts"))
    events.repartition(3).write.parquet(ev_dir)   # 3 files -> 3 epochs

    def _norm(df):
        return (df.select("user_id", "n_events", "n_types",
                          "min_ts", "max_ts")
                  .toPandas().sort_values("user_id")
                  .reset_index(drop=True))

    got = _norm(run_user_state_job(spark, ev_dir, out_dir, ckpt))
    want = _norm(spark.read.parquet(ev_dir).groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts")))
    assert got.equals(want), (got, want)

    # un-commit the last epoch and rerun: the replay must OVERWRITE its
    # epoch partition, leaving the final reduction unchanged
    commits = sorted(f for f in os.listdir(ckpt + "/commits")
                     if not f.startswith("."))
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    again = _norm(run_user_state_job(spark, ev_dir, out_dir, ckpt))
    assert again.equals(want)


def test_streaming_cache_invalidates_on_regeneration(tmp_path):
    """_source_fingerprint must change when a parquet source is rewritten
    in place (same path, same sizes, new mtime)."""
    from sparklog.queries import _source_fingerprint

    p = tmp_path / "events.parquet"
    p.write_bytes(b"x" * 64)
    f1 = _source_fingerprint(str(p))
    os.utime(p, ns=(1, 2))
    f2 = _source_fingerprint(str(p))
    assert f1 != f2


def test_streaming_epoch_replay_is_exactly_once(spark, tmp_path):
    """A crash between a (possibly partial) sink write and the checkpoint
    commit replays the epoch on restart.  Simulated by deleting the last
    commit marker after a successful run: the replayed epoch must
    OVERWRITE its epoch=<id> partitions, not append duplicates."""
    src_dir = str(tmp_path / "stream_src")
    os.makedirs(src_dir)
    out_dir = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")

    fixtures.write_tokens_table(spark, fixtures.synth_lines(400, seed=4),
                                src_dir + "/b", n_partitions=1)
    for f in glob.glob(src_dir + "/b/*.parquet"):
        os.rename(f, src_dir + "/" + os.path.basename(f))
    q = start_streaming_job(spark, src_dir, out_dir, ckpt)
    q.awaitTermination(120)
    q.stop()
    sinks = spark.read.parquet(out_dir + "/sinks")
    assert sinks.count() == 400

    # un-commit the last epoch (the write itself already happened); the
    # local-FS checksum sidecar must go too or the rewrite trips Hadoop's
    # stale-CRC check
    commits = sorted(f for f in os.listdir(ckpt + "/commits")
                     if not f.startswith("."))
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    q = start_streaming_job(spark, src_dir, out_dir, ckpt)
    q.awaitTermination(120)
    q.stop()
    replayed = spark.read.parquet(out_dir + "/sinks")
    assert replayed.count() == 400                       # no duplicates
    assert replayed.select("doc_id").distinct().count() == 400


def test_streaming_incremental_dedup_epochs_and_batch_parity(spark, tmp_path):
    """The continuous-ingestion dedup must (a) actually split the input
    into multiple epochs (maxFilesPerTrigger=2 over a 4-file batch dir)
    and (b) produce, across all epochs, exactly the batch operator's
    corpus-facing flags — the probe is a pure per-doc function of
    (text, static corpus), so the epoch split must be invisible."""
    from pyspark.sql import functions as F

    from sparklog.queries import _t, dedup_incremental
    from sparklog.streaming import run_incremental_dedup_stream

    sf = "/root/testdata/sf0.001"
    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "source")
    batch_src = (docs.where(F.col("source").isNotNull())
                     .agg(F.min("source")).collect()[0][0])
    b_dir = str(tmp_path / "batch")
    (docs.where(F.col("source") == batch_src).select("doc_id", "text")
         .repartition(4).write.parquet(b_dir))
    corpus = (docs.where(F.col("source").isNull()
                         | (F.col("source") != batch_src))
                  .select("doc_id", "text"))

    out = run_incremental_dedup_stream(
        spark, b_dir, corpus, str(tmp_path / "out"), str(tmp_path / "ck"))
    assert out.select("epoch").distinct().count() >= 2
    got = {r.doc_id: (r.exact_dup_corpus, r.near_dup_corpus)
           for r in out.collect()}
    want = {r.doc_id: (r.exact_dup_corpus, r.near_dup_corpus)
            for r in dedup_incremental(spark, sf).collect()}
    assert got == want


def test_streaming_incremental_dedup_empty_batch(spark, tmp_path):
    """An all-NULL-source corpus has no batch: zero epochs fire, nothing
    is written, and the streaming wrapper must return the same empty
    result the batch operator does instead of failing schema inference
    on the never-written output dir."""
    import pandas as pd

    from sparklog.queries import dedup_incremental, \
        streaming_incremental_dedup

    pdf = pd.DataFrame([(1, "a b c d", "en", None), (2, None, "en", None)],
                       columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().fillna(0).astype("int32")
    d = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        f"{d}/documents.parquet")
    assert dedup_incremental(spark, d).count() == 0
    out = streaming_incremental_dedup(spark, d)
    assert out.count() == 0
    assert out.columns == ["doc_id", "exact_dup_corpus", "near_dup_corpus"]
