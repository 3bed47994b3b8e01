"""Curation-operator tests: repetition signals, per-source caps, mixture
sampling, sequence packing (operators/curation.py)."""
import pytest
from pyspark.sql import functions as F

from openpoiservice_spark.operators import curation as CU


def _docs(spark):
    rows = [
        # doc 0: "a a a b" -> dup 0.5, top word a 3/4, top bigram "a a" 2/3
        (0, "a a a b", "s0"),
        # doc 1: all distinct
        (1, "one two three four", "s0"),
        # doc 2: single word (no bigrams)
        (2, "solo", "s1"),
        (3, "x y x y x y", "s1"),
        (4, "alpha beta alpha beta gamma", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_repetition_signals_known_values(spark):
    out = {r["doc_id"]: r for r in CU.repetition_signals(_docs(spark)).collect()}
    d0 = out[0]
    assert d0["n_words"] == 4
    assert d0["dup_word_frac"] == 0.5
    assert d0["top_word_frac"] == 0.75
    assert d0["top_bigram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    d1 = out[1]
    assert d1["dup_word_frac"] == 0.0 and d1["top_word_frac"] == 0.25
    d2 = out[2]  # one word: no bigrams -> 0.0, top word 1.0
    assert d2["top_bigram_frac"] == 0.0 and d2["top_word_frac"] == 1.0
    d3 = out[3]  # "x y" 3 times in 5 bigrams
    assert d3["dup_word_frac"] == pytest.approx(1 - 2 / 6, abs=1e-6)
    assert d3["top_bigram_frac"] == pytest.approx(3 / 5, abs=1e-6)


def test_cap_per_source_bucket_invariance(spark):
    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.lit("t").alias("text"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    a = CU.cap_per_source(docs, 7, buckets=1).select("doc_id").collect()
    b = CU.cap_per_source(docs, 7, buckets=16).select("doc_id").collect()
    c = CU.cap_per_source(docs.repartition(13), 7, buckets=16) \
        .select("doc_id").collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b) \
        == sorted(r.doc_id for r in c)
    counts = CU.cap_per_source(docs, 7).groupBy("source").count().collect()
    assert all(r["count"] == 7 for r in counts)


def test_cap_per_source_under_cap_keeps_all(spark):
    docs = _docs(spark)
    assert CU.cap_per_source(docs, 100).count() == docs.count()


def test_sample_by_source_nested_and_edges(spark):
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text"),
        F.lit("s0").alias("source"))
    half = {r.doc_id for r in
            CU.sample_by_source(docs, {"s0": 0.5}).select("doc_id").collect()}
    quarter = {r.doc_id for r in
               CU.sample_by_source(docs, {"s0": 0.25}).select("doc_id").collect()}
    assert quarter <= half  # nested sampling: lower rate is a subset
    assert 0.4 < len(half) / 1000 < 0.6
    assert CU.sample_by_source(docs, {"s0": 0.0}).count() == 0
    assert CU.sample_by_source(docs, {"s0": 1.0}).count() == 1000
    # default_rate applies to unlisted sources
    assert CU.sample_by_source(docs, {"zzz": 0.0}, default_rate=1.0).count() == 1000


def test_pack_sequences_invariants(spark):
    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        # word counts 1..40
        F.expr("array_join(transform(sequence(1, CAST(id % 40 + 1 AS INT)), "
               "x -> 'w'), ' ')").alias("text"),
    )
    out = CU.pack_sequences(docs, budget=64, buckets=8)
    rows = out.collect()
    assert len(rows) == 400 and len({r.doc_id for r in rows}) == 400
    fills = out.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("s"), F.first("bin_fill").alias("f")).collect()
    assert all(r.s == r.f for r in fills)  # bin_fill is the bin's true total
    assert all(r.f <= 64 for r in fills)   # no oversize docs here
    # deterministic under repartition
    again = CU.pack_sequences(docs.repartition(17), budget=64, buckets=8)
    assert sorted((r.doc_id, r.bin_id) for r in again.collect()) \
        == sorted((r.doc_id, r.bin_id) for r in rows)


def test_pack_sequences_oversize_policies(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, " ".join(["w"] * 50))], "doc_id long, text string")
    own = CU.pack_sequences(docs, budget=10, buckets=2)
    got = {r.doc_id: r for r in own.collect()}
    assert len(got) == 2
    # oversize doc sits alone in its own bin
    big_bin = got[2].bin_id
    assert sum(1 for r in own.collect() if r.bin_id == big_bin) == 1
    dropped = CU.pack_sequences(docs, budget=10, buckets=2, oversize="drop")
    assert [r.doc_id for r in dropped.collect()] == [1]


def test_curate_repetition_ceiling_subsets(spark):
    from openpoiservice_spark.operators import text as TX
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = {r.doc_id for r in TX.curate(docs).collect()}
    tight = {r.doc_id for r in
             TX.curate(docs, max_dup_word_frac=0.5).collect()}
    loose = {r.doc_id for r in
             TX.curate(docs, max_dup_word_frac=0.9).collect()}
    assert tight < loose <= base  # monotone in the ceiling, strict at 0.5
    both = {r.doc_id for r in
            TX.curate(docs, max_dup_word_frac=0.5,
                      max_top_bigram_frac=0.05).collect()}
    assert both <= tight
