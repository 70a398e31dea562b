"""Training-data prep operators (round 4): stratified sampling, length
quantiles, sequence packing.  Cross-engine parity is covered by the
oracle gate; these check the SEMANTIC invariants the oracle can't state.
"""

from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_stratified_sample_deterministic_and_composable(spark):
    """Membership is a pure function of doc_id: two runs agree exactly,
    and halving a stratum's threshold yields a SUBSET (composability —
    the property that lets a pipeline re-mix quotas without resampling
    the corpus)."""
    from pyspark.sql import functions as F

    from sparklog.queries import _SAMPLE_RATES, sample_stratified_documents

    a = {r.doc_id for r in sample_stratified_documents(spark, SF).collect()}
    b = {r.doc_id for r in sample_stratified_documents(spark, SF).collect()}
    assert a == b and a
    # a half-rate re-sample of the kept 'en' docs is a subset
    half_hex = format(int(_SAMPLE_RATES["en"] / 2 * 2**32), "08x")
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .where(F.col("lang") == "en")
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.substring(F.md5(F.col("doc_id").cast("string")),
                                1, 8).alias("h")))
    half = {r.doc_id for r in docs.where(F.col("h") < half_hex).collect()}
    full_en = {r.doc_id for r in docs.collect()}
    assert half <= (a & full_en)


def test_pack_sequences_offsets_are_exclusive_running_sums(spark):
    """Within every (lang, shard) stream ordered by doc_id: offset(k) =
    offset(k-1) + n_tok(k-1), first offset is 0, and pack_id =
    offset // capacity."""
    from sparklog.queries import _PACK_CAPACITY, pack_sequences

    rows = pack_sequences(spark, SF).collect()
    streams = defaultdict(list)
    for r in rows:
        streams[(r.lang, r.shard)].append(r)
    assert len(rows) == 500 and len(streams) > 1
    for rs in streams.values():
        rs.sort(key=lambda r: r.doc_id)
        off = 0
        for r in rs:
            assert r.tok_offset == off, (r, off)
            assert r.pack_id == off // _PACK_CAPACITY
            off += r.n_tok
