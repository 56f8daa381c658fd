"""Streaming approximate-nearest-neighbor: a stream of probe vectors
against a static embedding corpus, windowed top-k per probe.

Shape: stream-static join (the static side broadcast — it is the
probe-time index, not the raw corpus at scale), cosine scored with the
same built-in ``zip_with``/``aggregate`` fold the batch operators use
(operators/similarity.py), then an event-time-windowed aggregation that
keeps only the top-k per (window, probe) — ``collect_list`` of
(−cosine, neighbor) structs, ``array_sort``, ``slice`` — emitted on
window close (append mode + watermark), so state per probe is one
in-flight window's candidate list.

Scale path: at a 10^9-vector corpus the static side is NOT the flat
corpus — pass ``corpus`` as the IVF-restricted table (cell-bucketed
vectors for the cells the probes route to, cf. similarity.ivf_topk):
the probe stream joins on ``cell`` instead of cross-joining, and
everything downstream is identical.  The brute-force form below is the
correctness baseline and the small-corpus (rerank) path.

Reference surface: the reference has no ANN; its windowed top-N
emission (PointPruningProcessorSupplier.java:88-94) is the same
close-window-emit-topk shape this reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kelos_on_kafka_spark.operators.similarity import _dot, _norm


def stream_cosine_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "vec",
    corpus_id_col: str = "vec_id",
    corpus_vec_col: str = "embedding",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Windowed exact top-k cosine neighbors for each probe on a
    STREAM of probes: returns a streaming DataFrame
    (window_start, window_end, probe_id, rank, neighbor_id) that emits
    when the event-time window closes.  Self-matches (probe_id ==
    neighbor_id) are excluded; ranking is (cosine desc, neighbor_id
    asc), identical to the batch ``cosine_topk`` contract."""
    c = corpus.select(
        F.col(corpus_id_col).alias("neighbor_id"),
        F.col(corpus_vec_col).cast("array<double>").alias("cvec"),
    ).withColumn("cnrm", _norm(F.col("cvec")))
    p = probes.withWatermark(ts_col, watermark_delay).select(
        F.col(ts_col).alias("_ts"),
        F.col(probe_id_col).alias("probe_id"),
        F.col(probe_vec_col).cast("array<double>").alias("pvec"),
    ).withColumn("pnrm", _norm(F.col("pvec")))
    scored = (
        p.join(F.broadcast(c), F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "_ts",
            "probe_id",
            "neighbor_id",
            # try_divide: a zero-norm vector (degenerate probe/corpus
            # row, or the harness watermark sentinel) yields NULL
            # cosine — sorts after every real score — instead of an
            # ANSI DIVIDE_BY_ZERO that would kill the whole stream
            F.try_divide(
                _dot(F.col("pvec"), F.col("cvec")),
                F.col("pnrm") * F.col("cnrm"),
            ).alias("cosine"),
        )
    )
    # drop undefined scores entirely (zero-norm rows): keeps the
    # struct sort free of NULL fields.  This sits AFTER the watermark
    # operator, so a sentinel row still advances event time.
    scored = scored.where(F.col("cosine").isNotNull())
    top = scored.groupBy(
        F.window("_ts", window).alias("w"), F.col("probe_id")
    ).agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("cosine")).alias("neg_cosine"),
                        F.col("neighbor_id"),
                    )
                )
            ),
            1,
            k,
        ).alias("top")
    )
    return top.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "probe_id",
        F.posexplode("top").alias("pos", "entry"),
    ).select(
        "window_start",
        "window_end",
        "probe_id",
        (F.col("pos") + 1).cast("int").alias("rank"),
        F.col("entry.neighbor_id").alias("neighbor_id"),
    )
