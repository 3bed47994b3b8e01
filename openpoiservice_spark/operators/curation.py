"""Corpus-curation operators: repetition/quality signals, per-source caps,
deterministic mixture sampling, and sequence packing.

These are the training-data-mix operators a 100 TB pretraining pipeline runs
after dedup (operators/text.py) and before tokenization — the reference has
no analogue (its per-request query surface stops at filtering/aggregation,
`/root/reference/openpoiservice/server/api/query_builder.py`), but the build
brief makes them first-class engine components.

Scale notes (the 100 TB design point):
  * `repetition_signals` explodes words/bigrams but immediately map-side
    combines into per-(doc, term) counts before the only shuffle; the second
    agg is per-doc.  No window functions, no skew beyond true per-doc size.
  * `cap_per_source` is the skew-aware two-phase exact top-cap: a global
    window over a dominant source would funnel that source's entire corpus
    through one reducer, so phase 1 ranks within (source, salt-bucket) and
    discards all but `cap` rows per bucket — the phase-2 exact window sees
    at most `buckets * cap` rows per source regardless of corpus size.
  * `sample_by_source` is a pure narrow filter (hash arithmetic in
    whole-stage codegen, rates broadcast as a literal CASE) — zero shuffle,
    the shape you want for mixture weighting at any scale.
  * `pack_sequences` does greedy first-fit-decreasing inside hash-bucketed
    groups via applyInPandas: packing is inherently sequential, so the
    global problem is sharded into ~`bins_hint`-doc groups that each pack
    independently and deterministically.  Bin ids are globally unique
    (bucket id is the high component).

Hashes are md5-based like text.py so the DuckDB oracle twins are
bit-identical; see text._h32.
"""

from __future__ import annotations

from typing import Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import _h32

#: words = non-whitespace runs, identical spelling in Spark and DuckDB
_WORDS = r"regexp_extract_all(text, '\\S+', 0)"


def _words_col() -> Column:
    return F.expr(_WORDS)


# ----------------------------------------------------- repetition signals

def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition features per document:

      dup_word_frac   1 - distinct(words)/count(words)  (0 when empty)
      top_word_frac   count of the modal word / count(words)
      top_bigram_frac count of the modal word-bigram / count(bigrams)

    High values flag boilerplate / keyword-stuffed pages that survive exact
    and near dedup.  Plan: one explode -> per-(doc, term) partial count ->
    per-doc max/sum agg; the explode map-side combines so the shuffle
    carries distinct terms, not raw tokens.
    """
    words = _words_col()
    base = docs.select("doc_id", words.alias("w"))
    # dup_word_frac is pure array math — no explode needed
    dup = base.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
    )
    # modal-term fractions share one explode pipeline, tagged by kind
    bigrams = F.zip_with(
        F.slice(F.col("w"), 1, F.greatest(F.size("w") - 1, F.lit(0))),
        F.slice(F.col("w"), 2, F.greatest(F.size("w") - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    terms = base.select(
        "doc_id",
        F.explode(F.array(
            F.struct(F.lit("w").alias("kind"), F.col("w").alias("terms")),
            F.struct(F.lit("b").alias("kind"), bigrams.alias("terms")),
        )).alias("kb"),
    ).select("doc_id", F.col("kb.kind").alias("kind"),
             F.explode("kb.terms").alias("term"))
    modal = (
        terms.groupBy("doc_id", "kind", "term").count()
        .groupBy("doc_id", "kind")
        .agg(F.max("count").alias("top"), F.sum("count").alias("tot"))
        .groupBy("doc_id")
        .pivot("kind", ["w", "b"])
        .agg(F.first(F.round(F.col("top") / F.col("tot"), 6)).alias("frac"))
    )
    return (
        dup.join(modal, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.when(F.col("n_words") > 0,
                   F.round(1 - F.col("n_distinct") / F.col("n_words"), 6))
            .otherwise(F.lit(0.0)).alias("dup_word_frac"),
            F.coalesce(F.col("w"), F.lit(0.0)).alias("top_word_frac"),
            F.coalesce(F.col("b"), F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


# ------------------------------------------------------- per-source caps

def cap_per_source(docs: DataFrame, cap: int, buckets: int = 16) -> DataFrame:
    """Keep at most `cap` documents per `source`, deterministically: ranked
    by (md5-hash of doc_id, doc_id) so the kept set is an unbiased stable
    sample, independent of input order and parallelism.

    Exact two-phase top-cap (skew-aware): phase 1 ranks inside
    (source, hash-bucket) and keeps `cap` per bucket — a source with 10^9
    rows sends at most `buckets * cap` rows to phase 2, which applies the
    exact global per-source rank.  Equivalent to the single-window form for
    any bucket count because per-bucket rank > cap implies global rank > cap.
    """
    from pyspark.sql import Window

    pri = _h32(F.col("doc_id").cast("string"))
    b = F.pmod(pri, F.lit(buckets))
    w1 = Window.partitionBy("source", "_b").orderBy("_pri", "doc_id")
    w2 = Window.partitionBy("source").orderBy("_pri", "doc_id")
    return (
        docs.withColumn("_pri", pri)
        .withColumn("_b", b)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= cap)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= cap)
        .drop("_pri", "_b", "_r1", "_r2")
    )


def sample_by_source(docs: DataFrame, rates: Mapping[str, float],
                     default_rate: float = 1.0) -> DataFrame:
    """Deterministic per-source subsampling — the training-mixture weighting
    step.  A document survives iff md5-hash(doc_id) mod 1e6 < rate * 1e6 for
    its source's rate, so the sample is stable across runs, machines and
    partitionings, and nested: rate 0.25 keeps a subset of rate 0.5's rows.

    Pure narrow filter: the rate table is inlined as a CASE literal (tiny
    mixture configs don't deserve a broadcast join), the hash is one md5 in
    whole-stage codegen, no shuffle at any corpus size.
    """
    key = F.pmod(_h32(F.col("doc_id").cast("string")), F.lit(1_000_000))
    rate: Column = F.lit(float(default_rate))
    for src, r in sorted(rates.items()):
        rate = F.when(F.col("source") == src, F.lit(float(r))).otherwise(rate)
    return docs.filter(key < rate * F.lit(1_000_000.0))


# ------------------------------------------------------ sequence packing

_PACK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_tokens", T.LongType()),
    T.StructField("bin_id", T.LongType()),
    T.StructField("bin_fill", T.LongType()),
])


def pack_sequences(docs: DataFrame, budget: int, buckets: int = 64,
                   oversize: str = "own_bin") -> DataFrame:
    """Greedy sequence packing: assign each document to a token-budget bin
    (first-fit decreasing) so training examples can be concatenated with
    minimal padding.  Packing is sequential, so the corpus is sharded into
    `buckets` deterministic hash groups that pack independently — bin ids
    are `bucket * 2^32 + local_bin`, globally unique, and the result is
    invariant to partitioning (groups are hash-defined, the per-group order
    is (n_tokens desc, doc_id)).

    oversize: 'own_bin' gives docs with n_tokens > budget a dedicated bin
    (truncate at tokenization time); 'drop' discards them.

    Returns (doc_id, n_tokens, bin_id, bin_fill) where bin_fill is the
    bin's total tokens.  applyInPandas is the right tool here: the loop is
    genuinely stateful per group, groups are bounded (~n/buckets docs), and
    the pandas pass is O(docs * bins_touched) with a first-fit array scan.
    """
    n_tok = F.size(_words_col()).cast("long")
    base = (
        docs.select("doc_id", n_tok.alias("n_tokens"))
        .withColumn("_bucket", F.pmod(_h32(F.col("doc_id").cast("string")),
                                      F.lit(buckets)))
    )
    if oversize == "drop":
        base = base.filter(F.col("n_tokens") <= budget)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["_bucket"].iloc[0])
        pdf = pdf.sort_values(["n_tokens", "doc_id"],
                              ascending=[False, True]).reset_index(drop=True)
        fills: list[int] = []
        assign: list[int] = []
        for tok in pdf["n_tokens"].to_numpy():
            placed = -1
            if tok <= budget:
                for i, f in enumerate(fills):
                    if f + tok <= budget:
                        placed = i
                        break
            if placed < 0:
                placed = len(fills)
                fills.append(0)
            fills[placed] += int(tok)
            assign.append(placed)
        out = pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_tokens": pdf["n_tokens"],
            "bin_id": [bucket * (1 << 32) + a for a in assign],
            "bin_fill": [fills[a] for a in assign],
        })
        return out

    return base.groupBy("_bucket").applyInPandas(_pack, schema=_PACK_SCHEMA)
