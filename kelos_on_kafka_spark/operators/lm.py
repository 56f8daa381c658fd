"""Corpus n-gram language-model scoring — the "perplexity proxy" a
web-scale training-data pipeline uses to rank documents by how typical
their word sequences are of the corpus (rare-sequence docs are
boilerplate, gibberish, or contamination candidates; KenLM-style
perplexity filters are the deployment-grade version of this signal).

Design for hash-strict oracles AND 100 TB:

* Integer-first output.  A true log-probability needs ln(), whose last
  ULP differs across engines and breaks byte-strict comparison; summing
  floats is also order-dependent under a shuffle.  So the per-doc
  statistics are exact integers (bigram corpus frequencies: min / sum /
  count) plus ONE final double division (IEEE-deterministic on both
  engines) — mean corpus frequency of the doc's bigrams.  A deployment
  that wants real perplexity swaps ln(c12/c1) into the same plan shape.
* The bigram table is built with builtins only (split / slice /
  arrays_zip / explode) — whole-stage codegen, no Python.
* Two aggregations, both map-side combinable (gram counting), and one
  big-to-big shuffle join of gram instances against the count table on
  the gram key.  Hot grams (stopword pairs) are high-frequency on BOTH
  sides but the count side is one row per gram, so the join skew is
  bounded; AQE skew-join splits the instance side.  Documents' text
  never shuffles — only (doc_id, gram) pairs.

Reference surface: none (the reference scores numeric GMM points,
Main.java:46-76); this is the webtext-quality generalization the
north-star calls "language-model perplexity proxies".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bigrams(text_col: str):
    """Array of 'w1 w2' word bigrams of a whitespace-tokenized text —
    builtins only, identical tokenization to dedup._shingles."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("w1"),
        F.slice(toks, 2, n - 1).alias("w2"),
    )
    return F.transform(
        pairs, lambda p: F.concat_ws(" ", p["w1"], p["w2"])
    )


def bigram_rarity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram-frequency statistics against the corpus's
    own bigram table: (doc_id, n_bigrams, min_bigram_freq,
    sum_bigram_freq, mean_bigram_freq).  ``min_bigram_freq = 1`` means
    the document contains a bigram seen nowhere else — the strongest
    cheap rarity signal; ``mean_bigram_freq`` is the smooth score to
    threshold on.  Documents with fewer than 2 tokens are excluded
    (they have no bigrams to score)."""
    from kelos_on_kafka_spark.plans.layout import fan_out

    grams = fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(_bigrams(text_col)).alias("gram"),
    ).where(F.col("gram") != "")
    counts = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("c_gram")
    )
    scored = grams.join(counts, "gram")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.min("c_gram").alias("min_bigram_freq"),
        F.sum("c_gram").alias("sum_bigram_freq"),
        (
            F.sum("c_gram").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_bigram_freq"),
    )
