"""Batch KELOS engine — Spark-first orchestration of the shared NumPy
kernel (``kelos_on_kafka_spark.core``).

Physical plan, designed for the 100 TB target:

1. **Stage A — pane clustering** (the only inherently sequential part,
   reference: ClusteringProcessorSupplier + AggregationProcessor).  Input
   is hash-partitioned by shard and sorted ``(shard, pane_id, point_id)``
   within partitions; a ``mapInPandas`` iterator walks the sorted stream
   pane-by-pane with **bounded memory** (one pane at a time — the whole
   group is never materialized), maintaining carry-over cluster state per
   shard exactly like the reference's TempClusters/ClusterStates/global
   store.  Emits a union-typed stream of per-point assignments and
   per-window cluster aggregates.  Parallelism = #shards: the greedy
   clustering is order-dependent (SURVEY.md §7.3), so within a shard it
   cannot be parallelized without changing results — the reference is
   single-partition for the same reason (InputProducer.java:67).

2. **Stage B — per-window detection** (everything from
   KNearestClusterProcessor to PointPruningProcessor).  Cluster aggregates
   and (window-exploded) assignments are cogrouped by ``(shard,
   window_id)`` and each window runs the vectorized KNN→KDE→KLOME→top-N
   pipeline independently — **embarrassingly parallel across windows**,
   which is where the compute lives (O(C²) KNN + KDE).  The ×panes
   assignment duplication is the same cost Spark's own sliding
   ``window()`` pays.

The shuffle between A and B is the deliberate repartition to window
groups; everything upstream (feature extraction) is embarrassingly
parallel and everything inside stages is Arrow-vectorized NumPy.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.storagelevel import StorageLevel

from kelos_on_kafka_spark import core
from kelos_on_kafka_spark.config import DEFAULT_CONFIG, KelosConfig

# Stage-A caches created by detect_outliers / kelos_debug_tables.  The
# returned DataFrames are lazy, so the operators cannot unpersist before
# the caller's action runs — callers own the lifecycle: call
# release_persisted() (or spark.catalog.clearCache()) once results are
# materialized, or repeated invocations in a long-lived session
# accumulate cached partitions until storage eviction kicks in.
_PERSISTED: list = []


def _persist_stage(df: DataFrame) -> DataFrame:
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(out)
    return out


def release_persisted() -> int:
    """Unpersist every stage cache this module created; returns how many
    were released."""
    n = len(_PERSISTED)
    for df in _PERSISTED:
        df.unpersist(False)
    _PERSISTED.clear()
    return n


STAGE_A_SCHEMA = StructType(
    [
        StructField("row_type", StringType()),  # 'a'=assignment, 'w'=window cluster
        StructField("shard", LongType()),
        StructField("pane_id", LongType()),
        StructField("cluster_id", LongType()),
        StructField("point_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
        StructField("size", LongType()),
        StructField("linear_sums", ArrayType(DoubleType())),
        StructField("mins", ArrayType(DoubleType())),
        StructField("maxs", ArrayType(DoubleType())),
    ]
)

OUTLIER_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("window_id", LongType()),
        StructField("window_start", TimestampType()),
        StructField("window_end", TimestampType()),
        StructField("rank", IntegerType()),
        StructField("point_id", LongType()),
        StructField("klome", DoubleType()),
        StructField("density", DoubleType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _stage_a_rows(
    shard: int,
    pane: int,
    ids: np.ndarray,
    X: np.ndarray,
    state: core.ShardState,
    cfg: KelosConfig,
) -> List[tuple]:
    """Close one pane for one shard: greedy clustering + window synthesis +
    carry-over update.  Returns union-typed output rows."""
    assignments, pane_clusters = core.cluster_pane(
        ids, X, state.carry, cfg.distance_threshold, cfg.k
    )
    window_clusters = core.aggregate_window(
        state, pane_clusters, cfg.panes_per_window
    )
    state.carry = core.carry_from_window(window_clusters)

    order = np.argsort(ids, kind="stable")
    rows = [
        (
            "a",
            shard,
            pane,
            int(assignments[i]),
            int(ids[order[i]]),
            [float(v) for v in X[order[i]]],
            None,
            None,
            None,
            None,
        )
        for i in range(len(ids))
    ]
    rows.extend(
        (
            "w",
            shard,
            pane,
            int(cid),
            None,
            [float(v) for v in wc.centroid],
            int(wc.size),
            [float(v) for v in wc.linear_sums],
            [float(v) for v in wc.mins],
            [float(v) for v in wc.maxs],
        )
        for cid, wc in window_clusters.items()
    )
    return rows


def _make_stage_a_fn(cfg: KelosConfig):
    def stage_a(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: Optional[core.ShardState] = None
        cur: Optional[Tuple[int, int]] = None  # (shard, pane)
        buf_ids: List[np.ndarray] = []
        buf_X: List[np.ndarray] = []
        out_rows: List[tuple] = []

        def flush_pane() -> None:
            nonlocal buf_ids, buf_X
            shard, pane = cur
            ids = (
                np.concatenate(buf_ids)
                if buf_ids
                else np.empty(0, dtype=np.int64)
            )
            X = (
                np.concatenate(buf_X)
                if buf_X
                else np.empty((0, 0))
            )
            out_rows.extend(_stage_a_rows(shard, pane, ids, X, state, cfg))
            buf_ids, buf_X = [], []

        def close_gap_panes(shard: int, upto_exclusive: int) -> None:
            """Empty panes between populated ones still close windows
            (catch-up punctuation; SURVEY.md §3.1)."""
            nonlocal cur
            pane = cur[1] + 1
            while pane < upto_exclusive:
                cur = (shard, pane)
                flush_pane()
                pane += 1

        for pdf in batches:
            if pdf.empty:
                continue
            shards = pdf["shard"].to_numpy()
            panes = pdf["pane_id"].to_numpy()
            pids = pdf["point_id"].to_numpy(dtype=np.int64)
            feats = np.stack(
                [np.asarray(f, dtype=np.float64) for f in pdf["features"]]
            )
            # split the sorted batch at (shard, pane) boundaries
            change = np.nonzero(
                (shards[1:] != shards[:-1]) | (panes[1:] != panes[:-1])
            )[0]
            starts = np.concatenate([[0], change + 1])
            ends = np.concatenate([change + 1, [len(pdf)]])
            for s, e in zip(starts, ends):
                key = (int(shards[s]), int(panes[s]))
                if cur is not None and key != cur:
                    flush_pane()
                    if key[0] == cur[0]:
                        close_gap_panes(key[0], key[1])
                    else:
                        state = None
                    cur = None
                if cur is None:
                    cur = key
                    if state is None:
                        state = core.ShardState()
                buf_ids.append(pids[s:e])
                buf_X.append(feats[s:e])
            if out_rows:
                yield pd.DataFrame(
                    out_rows, columns=STAGE_A_SCHEMA.fieldNames()
                )
                out_rows = []
        if cur is not None:
            flush_pane()
        if out_rows:
            yield pd.DataFrame(out_rows, columns=STAGE_A_SCHEMA.fieldNames())

    return stage_a


def _make_window_fn(cfg: KelosConfig):
    pane_s = cfg.pane_seconds
    panes = cfg.panes_per_window

    def window_fn(
        key: tuple, clusters_pdf: pd.DataFrame, assigns_pdf: pd.DataFrame
    ) -> pd.DataFrame:
        shard, window_id = int(key[0]), int(key[1])
        if clusters_pdf.empty:
            return pd.DataFrame(columns=OUTLIER_SCHEMA.fieldNames())
        clusters_pdf = clusters_pdf.sort_values("cluster_id")
        wcs: "core.OrderedMap[int, core.WindowCluster]" = {}
        for row in clusters_pdf.itertuples(index=False):
            cid = int(row.cluster_id)
            wcs[cid] = core.WindowCluster(
                cluster_id=cid,
                size=int(row.size),
                linear_sums=np.asarray(row.linear_sums, dtype=np.float64),
                centroid=np.asarray(row.features, dtype=np.float64),
                mins=np.asarray(row.mins, dtype=np.float64),
                maxs=np.asarray(row.maxs, dtype=np.float64),
            )
        if assigns_pdf.empty:
            pids = np.empty(0, dtype=np.int64)
            cids = np.empty(0, dtype=np.int64)
            X = np.empty((0, 0))
        else:
            pids = assigns_pdf["point_id"].to_numpy(dtype=np.int64)
            cids = assigns_pdf["p_cluster_id"].to_numpy(dtype=np.int64)
            X = np.stack(
                [
                    np.asarray(f, dtype=np.float64)
                    for f in assigns_pdf["p_features"]
                ]
            )
        outliers, _flags, _cands = core.window_pipeline(
            wcs, pids, cids, X, cfg.k, cfg.n, cfg.kernel
        )
        if not outliers:
            return pd.DataFrame(columns=OUTLIER_SCHEMA.fieldNames())
        end_s = (window_id + 1) * pane_s
        start_s = (window_id + 1 - panes) * pane_s
        return pd.DataFrame(
            {
                "shard": np.int64(shard),
                "window_id": np.int64(window_id),
                "window_start": pd.Timestamp(start_s, unit="s", tz="UTC"),
                "window_end": pd.Timestamp(end_s, unit="s", tz="UTC"),
                "rank": np.array([o.rank for o in outliers], dtype=np.int32),
                "point_id": np.array(
                    [o.point_id for o in outliers], dtype=np.int64
                ),
                "klome": [o.klome for o in outliers],
                "density": [o.density for o in outliers],
                "features": [list(o.features) for o in outliers],
            }
        )

    return window_fn


def prepare_points(
    df: DataFrame,
    cfg: KelosConfig = DEFAULT_CONFIG,
    id_col: str = "id",
    ts_col: str = "ts",
    features_col: str = "features",
    shard_col: Optional[str] = None,
) -> DataFrame:
    """Normalize an input DataFrame to the engine's point model
    ``(shard, point_id, pane_id, features)``.  Pane assignment is
    epoch-aligned: ``pane_id = floor(unix_micros(ts) / pane_micros)``."""
    pane_us = cfg.pane_seconds * 1_000_000
    shard = F.col(shard_col).cast("long") if shard_col else F.lit(0).cast("long")
    return df.select(
        shard.alias("shard"),
        F.col(id_col).cast("long").alias("point_id"),
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(pane_us))
        .cast("long")
        .alias("pane_id"),
        F.col(features_col).cast("array<double>").alias("features"),
    )


def run_stage_a(points: DataFrame, cfg: KelosConfig = DEFAULT_CONFIG) -> DataFrame:
    """Sequential-per-shard pane clustering + window synthesis.

    ``repartition(shard)`` + ``sortWithinPartitions`` gives each task a
    contiguous, pane-ordered view of its shards; the mapInPandas iterator
    holds only one pane in memory at a time.
    """
    # Hash repartition on shard: single-pass (repartitionByRange's
    # sampler re-evaluates the whole upstream — incl. the feature UDF —
    # once more, doubling e2e cost).  Balance comes from shards >>
    # partitions (hash collisions average out); sortWithinPartitions
    # gives the pane-ordered iterator the stage needs.
    n_part = points.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        points.repartition(int(n_part), "shard")
        .sortWithinPartitions("shard", "pane_id", "point_id")
        .mapInPandas(_make_stage_a_fn(cfg), STAGE_A_SCHEMA)
    )


def _make_streamwise_fn(cfg: KelosConfig):
    """Whole KELOS dataflow per shard inside one sorted pass: pane close ->
    clustering -> window synthesis -> KNN/KDE/KLOME -> top-N, emitting
    outlier rows directly.  One shuffle total (the shard sort), no
    assignment explode, no cogroup — the right physical plan when
    #shards >= #cores."""
    pane_s = cfg.pane_seconds
    panes = cfg.panes_per_window

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: Optional[core.ShardState] = None
        ring: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        cur: Optional[Tuple[int, int]] = None
        buf_ids: List[np.ndarray] = []
        buf_X: List[np.ndarray] = []
        out_frames: List[pd.DataFrame] = []

        def close_pane() -> None:
            nonlocal buf_ids, buf_X
            shard, pane = cur
            ids = (
                np.concatenate(buf_ids) if buf_ids else np.empty(0, dtype=np.int64)
            )
            X = np.concatenate(buf_X) if buf_X else np.empty((0, 0))
            buf_ids, buf_X = [], []
            order = np.argsort(ids, kind="stable")
            ids, X = ids[order], X[order]
            assignments, pane_clusters = core.cluster_pane(
                ids, X, state.carry, cfg.distance_threshold, cfg.k
            )
            window_clusters = core.aggregate_window(state, pane_clusters, panes)
            state.carry = core.carry_from_window(window_clusters)
            ring.append((ids, assignments, X))
            if len(ring) > panes:
                ring.pop(0)
            w_ids = np.concatenate([a[0] for a in ring])
            w_cids = np.concatenate([a[1] for a in ring])
            w_X = (
                np.concatenate([a[2] for a in ring if a[2].size])
                if any(a[2].size for a in ring)
                else np.empty((0, 0))
            )
            outliers, _f, _c = core.window_pipeline(
                window_clusters, w_ids, w_cids, w_X, cfg.k, cfg.n, cfg.kernel
            )
            if outliers:
                out_frames.append(
                    pd.DataFrame(
                        {
                            "shard": np.int64(shard),
                            "window_id": np.int64(pane),
                            "window_start": pd.Timestamp(
                                (pane + 1 - panes) * pane_s, unit="s", tz="UTC"
                            ),
                            "window_end": pd.Timestamp(
                                (pane + 1) * pane_s, unit="s", tz="UTC"
                            ),
                            "rank": np.array(
                                [o.rank for o in outliers], dtype=np.int32
                            ),
                            "point_id": np.array(
                                [o.point_id for o in outliers], dtype=np.int64
                            ),
                            "klome": [o.klome for o in outliers],
                            "density": [o.density for o in outliers],
                            "features": [list(o.features) for o in outliers],
                        }
                    )
                )

        buf_ids = []
        buf_X = []
        for pdf in batches:
            if pdf.empty:
                continue
            shards = pdf["shard"].to_numpy()
            panes_col = pdf["pane_id"].to_numpy()
            pids = pdf["point_id"].to_numpy(dtype=np.int64)
            feats = np.stack(
                [np.asarray(f, dtype=np.float64) for f in pdf["features"]]
            )
            change = np.nonzero(
                (shards[1:] != shards[:-1]) | (panes_col[1:] != panes_col[:-1])
            )[0]
            starts = np.concatenate([[0], change + 1])
            ends = np.concatenate([change + 1, [len(pdf)]])
            for s, e in zip(starts, ends):
                key = (int(shards[s]), int(panes_col[s]))
                if cur is not None and key != cur:
                    close_pane()
                    if key[0] == cur[0]:
                        pane = cur[1] + 1
                        while pane < key[1]:
                            cur = (key[0], pane)
                            close_pane()
                            pane += 1
                    else:
                        state = None
                        ring.clear()
                    cur = None
                if cur is None:
                    cur = key
                    if state is None:
                        state = core.ShardState()
                buf_ids.append(pids[s:e])
                buf_X.append(feats[s:e])
            if out_frames:
                yield pd.concat(out_frames, ignore_index=True)
                out_frames = []
        if cur is not None:
            close_pane()
        if out_frames:
            yield pd.concat(out_frames, ignore_index=True)

    return fn


def detect_outliers_streamwise(
    df: DataFrame,
    cfg: KelosConfig = DEFAULT_CONFIG,
    id_col: str = "id",
    ts_col: str = "ts",
    features_col: str = "features",
    shard_col: Optional[str] = None,
) -> DataFrame:
    """Flagship query, shard-streamwise physical plan (one shuffle; use
    when #shards >= #cores — see detect_outliers for the window-parallel
    plan used when shards are few)."""
    points = prepare_points(df, cfg, id_col, ts_col, features_col, shard_col)
    n_part = points.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        points.repartition(int(n_part), "shard")
        .sortWithinPartitions("shard", "pane_id", "point_id")
        .mapInPandas(_make_streamwise_fn(cfg), OUTLIER_SCHEMA)
    )


CLUSTER_DEBUG_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("window_id", LongType()),
        StructField("cluster_id", LongType()),
        StructField("size", LongType()),
        StructField("centroid", ArrayType(DoubleType())),
        StructField("density", DoubleType()),
        StructField("min_density_bound", DoubleType()),
        StructField("max_density_bound", DoubleType()),
        StructField("might_contain_outliers", BooleanType()),
    ]
)

CANDIDATE_DEBUG_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("window_id", LongType()),
        StructField("point_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _make_debug_window_fn(cfg: KelosConfig, which: str):
    """Debug taps mirroring the reference's densities/candidates topics
    (ClusterConsumer.java reads `densities`; CandidatesConsumer filters
    flag=true — SURVEY.md §2.1 S4)."""

    def fn(key, clusters_pdf, assigns_pdf):
        shard, window_id = int(key[0]), int(key[1])
        if clusters_pdf.empty:
            schema = (
                CLUSTER_DEBUG_SCHEMA if which == "clusters" else CANDIDATE_DEBUG_SCHEMA
            )
            return pd.DataFrame(columns=schema.fieldNames())
        clusters_pdf = clusters_pdf.sort_values("cluster_id")
        wcs: "core.OrderedMap[int, core.WindowCluster]" = {}
        for row in clusters_pdf.itertuples(index=False):
            cid = int(row.cluster_id)
            wcs[cid] = core.WindowCluster(
                cluster_id=cid,
                size=int(row.size),
                linear_sums=np.asarray(row.linear_sums, dtype=np.float64),
                centroid=np.asarray(row.features, dtype=np.float64),
                mins=np.asarray(row.mins, dtype=np.float64),
                maxs=np.asarray(row.maxs, dtype=np.float64),
            )
        core.knn_clusters(wcs, cfg.k)
        survivors = core.estimate_cluster_densities(
            wcs, core.KERNELS[cfg.kernel]
        )
        flags = core.prune_clusters(survivors, cfg.n)
        if which == "clusters":
            return pd.DataFrame(
                {
                    "shard": np.int64(shard),
                    "window_id": np.int64(window_id),
                    "cluster_id": np.array(list(survivors), dtype=np.int64),
                    "size": np.array(
                        [survivors[c].size for c in survivors], dtype=np.int64
                    ),
                    "centroid": [list(survivors[c].centroid) for c in survivors],
                    "density": [survivors[c].density for c in survivors],
                    "min_density_bound": [
                        survivors[c].min_density_bound for c in survivors
                    ],
                    "max_density_bound": [
                        survivors[c].max_density_bound for c in survivors
                    ],
                    "might_contain_outliers": [flags[c] for c in survivors],
                }
            )
        # candidates
        if assigns_pdf.empty:
            return pd.DataFrame(columns=CANDIDATE_DEBUG_SCHEMA.fieldNames())
        pids = assigns_pdf["point_id"].to_numpy(dtype=np.int64)
        cids = assigns_pdf["p_cluster_id"].to_numpy(dtype=np.int64)
        X = np.stack(
            [np.asarray(f, dtype=np.float64) for f in assigns_pdf["p_features"]]
        )
        cands = core.filter_candidates(pids, cids, X, flags)
        if not cands:
            return pd.DataFrame(columns=CANDIDATE_DEBUG_SCHEMA.fieldNames())
        return pd.DataFrame(
            {
                "shard": np.int64(shard),
                "window_id": np.int64(window_id),
                "point_id": np.array(list(cands), dtype=np.int64),
                "features": [list(v) for v in cands.values()],
            }
        )

    return fn


def kelos_debug_tables(
    df: DataFrame,
    cfg: KelosConfig = DEFAULT_CONFIG,
    id_col: str = "id",
    ts_col: str = "ts",
    features_col: str = "features",
    shard_col: Optional[str] = None,
) -> dict:
    """The reference's debug topic surfaces as DataFrames
    (cluster-assignments / densities / candidates; SURVEY.md §2.1 S3-S4):
    returns {'assignments': ..., 'clusters': ..., 'candidates': ...}."""
    points = prepare_points(df, cfg, id_col, ts_col, features_col, shard_col)
    stage_a = _persist_stage(run_stage_a(points, cfg))

    assignments = stage_a.filter(F.col("row_type") == "a").select(
        "shard",
        "pane_id",
        F.col("point_id"),
        F.col("cluster_id"),
        F.col("features"),
    )
    wdf = stage_a.filter(F.col("row_type") == "w").select(
        "shard",
        F.col("pane_id").alias("window_id"),
        "cluster_id",
        "features",
        "size",
        "linear_sums",
        "mins",
        "maxs",
    )
    offsets = F.array(*[F.lit(i) for i in range(cfg.panes_per_window)])
    adf = (
        stage_a.filter(F.col("row_type") == "a")
        .withColumn("off", F.explode(offsets))
        .withColumn("window_id", F.col("pane_id") + F.col("off"))
        .select(
            "shard",
            "window_id",
            F.col("cluster_id").alias("p_cluster_id"),
            "point_id",
            F.col("features").alias("p_features"),
        )
    )
    clusters = (
        wdf.groupBy("shard", "window_id")
        .cogroup(adf.groupBy("shard", "window_id"))
        .applyInPandas(_make_debug_window_fn(cfg, "clusters"), CLUSTER_DEBUG_SCHEMA)
    )
    candidates = (
        wdf.groupBy("shard", "window_id")
        .cogroup(adf.groupBy("shard", "window_id"))
        .applyInPandas(
            _make_debug_window_fn(cfg, "candidates"), CANDIDATE_DEBUG_SCHEMA
        )
    )
    return {
        "assignments": assignments,
        "clusters": clusters,
        "candidates": candidates,
    }


def detect_outliers(
    df: DataFrame,
    cfg: KelosConfig = DEFAULT_CONFIG,
    id_col: str = "id",
    ts_col: str = "ts",
    features_col: str = "features",
    shard_col: Optional[str] = None,
    persist_stage_a: bool = True,
) -> DataFrame:
    """Top-N outliers per sliding window — the engine's flagship query.

    Returns a DataFrame with schema ``OUTLIER_SCHEMA`` ordered by
    (shard, window_id, rank) semantics (call ``orderBy`` for display).
    """
    points = prepare_points(df, cfg, id_col, ts_col, features_col, shard_col)
    stage_a = run_stage_a(points, cfg)
    if persist_stage_a:
        stage_a = _persist_stage(stage_a)

    wdf = stage_a.filter(F.col("row_type") == "w").select(
        "shard",
        F.col("pane_id").alias("window_id"),
        "cluster_id",
        "features",
        "size",
        "linear_sums",
        "mins",
        "maxs",
    )
    offsets = F.array(*[F.lit(i) for i in range(cfg.panes_per_window)])
    # Fresh aliases on the assignment side: both cogroup branches derive
    # from the same stage-A plan, so same-named attributes share exprIds
    # and Spark's cogroup dedup can prune them from one side under AQE.
    adf = (
        stage_a.filter(F.col("row_type") == "a")
        .withColumn("off", F.explode(offsets))
        .withColumn("window_id", F.col("pane_id") + F.col("off"))
        .select(
            "shard",
            "window_id",
            F.col("cluster_id").alias("p_cluster_id"),
            "point_id",
            F.col("features").alias("p_features"),
        )
    )

    return (
        wdf.groupBy("shard", "window_id")
        .cogroup(adf.groupBy("shard", "window_id"))
        .applyInPandas(_make_window_fn(cfg), OUTLIER_SCHEMA)
    )
