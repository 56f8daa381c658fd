"""Training-sequence preparation: document chunking and sequence
packing — the last relational mile before tokenized text becomes model
input.  Both are pure Catalyst expressions (split / sequence / slice /
window running sum); text leaves the scan only as per-chunk md5
fingerprints, so at 100 TB the shuffled payload is rows of ids +
16-byte digests, never the chunks themselves.

Reference surface: none (the reference consumes numeric vectors,
InputProducer.java:40-68); this is the LLM-pipeline layer the webtext
generalization needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

MAX_LONG = (1 << 63) - 1


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping fixed-size token windows per document (the
    sliding-window chunking used for long-document training and for
    retrieval indexing): chunks start at token 1, 1+stride, 1+2*stride,
    ... while the start lies inside the document.  Returns one row per
    chunk: (doc_id, chunk_idx, start_tok, n_tokens, chunk_md5) — the
    fingerprint stands in for the chunk text so nothing wide shuffles;
    a consumer re-slices the text column on demand.

    Scale shape: one projection + one explode per doc (xceil(n/stride)
    row amplification — the deliberate cost of overlap), no join, no
    window function; whole-stage codegen end to end."""
    from kelos_on_kafka_spark.plans.layout import fan_out

    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    docs = fan_out(docs)  # small scans arrive 1-partition; split+md5
    # over every chunk is the compute, so widen before the projection
    # NULL text coalesces to '' (one 1-token empty chunk, like an
    # empty doc) — without it, size(split(NULL)) is -1 under Spark's
    # legacy sizeOfNull and sequence(1, -1) errors (ADVICE r5)
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__toks"),
        n.alias("__n"),
        F.explode(starts).alias("start_tok"),
    )
    chunk = F.slice(F.col("__toks"), F.col("start_tok"), chunk_tokens)
    return exploded.select(
        "doc_id",
        (
            (F.col("start_tok") - 1) / F.lit(stride)
        ).cast("long").alias("chunk_idx"),
        "start_tok",
        F.least(
            F.lit(chunk_tokens), F.col("__n") - F.col("start_tok") + 1
        ).cast("long").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 256,
    part_col: str = "source",
) -> DataFrame:
    """Concat-and-split sequence packing (the GPT-style training-data
    layout): documents are laid end-to-end in ``id_col`` order WITHIN
    each ``part_col`` shard and cut every ``max_tokens`` tokens; each
    doc reports which sequence its first token lands in and at what
    offset — (part, doc_id, n_tokens, seq_id, seq_offset).

    Packing is deliberately per-shard, not global: a single global
    running sum is inherently sequential (one window partition = one
    task), while per-shard packing parallelizes across shards and is
    what production packers do (sequences never cross shard
    boundaries).  One shuffle on the shard key, one window pass."""
    from kelos_on_kafka_spark.plans.layout import fan_out

    # NULL text -> '' -> n_tokens = 1 (the [''] token), NEVER -1: under
    # Spark's legacy sizeOfNull a NULL text yields size() = -1, which
    # would silently corrupt every later doc's running prefix sum in
    # this shard (ADVICE r5); '' matches the dedup operators' NULL
    # convention and keeps the sum monotone
    n_tok = F.size(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    )
    base = fan_out(docs).select(
        F.col(part_col).alias("part"),
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("part").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum_prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.withColumn("__cum_prev", cum_prev).select(
        "part",
        "doc_id",
        "n_tokens",
        # integer div/mod — no float rounding, exact in any engine
        F.expr(f"__cum_prev div {max_tokens}").alias("seq_id"),
        F.expr(f"__cum_prev % {max_tokens}").alias("seq_offset"),
    )


def pack_token_ids(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    part_col: str = "source",
    max_tokens: int = 256,
    oov_id: int = -1,
) -> DataFrame:
    """Materialized packed training sequences: the composition of
    ``textstats.encode_tokens`` and ``pack_sequences`` that actually
    emits the model-input rows.  Within each ``part_col`` shard,
    documents' encoded token-id streams are laid end-to-end in
    ``id_col`` order and cut every ``max_tokens`` ids; one row per
    (part, seq_id) carries the sequence's token count and the md5 of
    its comma-joined ids — the digest stands in for the id array so
    the output (and the DuckDB oracle hash) stays narrow.

    Counting convention: tokenless docs (NULL/empty text) occupy NO
    slots — the packer runs over the *encoded* stream, where they have
    no rows.  (``pack_sequences`` counts raw split tokens, where an
    empty doc is the 1-token [''] — that operator reports layout for
    re-slicing text; this one packs ids, so the encoded stream is the
    authority.)

    Scale shape: the vocab lookup is a broadcast join (vocabulary-
    sized right side); doc start offsets come from a per-shard window
    over the DOC-level count table (corpus-row-count rows, not
    tokens), joined back to the token stream on the doc id — one hash
    shuffle of (ids + positions), never text; the final groupBy holds
    at most ``max_tokens`` ids per group (bounded collect_list)."""
    from kelos_on_kafka_spark.plans.layout import fan_out

    docs = fan_out(docs)  # small scans arrive 1-partition; the
    # explode over every token is the compute, so widen first
    toks = docs.select(
        F.col(part_col).alias("part"),
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(
                F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"
            )
        ).alias("pos", "token"),
    ).where(F.col("token") != "")
    enc = toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        "part",
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.coalesce(
            F.col("token_id"), F.lit(int(oov_id)).cast("long")
        ).alias("token_id"),
    )
    counts = enc.groupBy("part", "doc_id").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = Window.partitionBy("part").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    starts = counts.select(
        "part",
        "doc_id",
        F.coalesce(F.sum("__n").over(w), F.lit(0)).alias("__doc_start"),
    )
    placed = enc.join(starts, ["part", "doc_id"]).select(
        "part",
        (F.col("__doc_start") + F.col("pos")).alias("__g"),
        "token_id",
    )
    return (
        placed.select(
            "part",
            F.expr(f"__g div {max_tokens}").alias("seq_id"),
            F.expr(f"__g % {max_tokens}").alias("__pos_in_seq"),
            "token_id",
        )
        .groupBy("part", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct("__pos_in_seq", "token_id")
                            )
                        ),
                        lambda s: s.token_id.cast("string"),
                    ),
                    ",",
                )
            ).alias("ids_md5"),
        )
    )
