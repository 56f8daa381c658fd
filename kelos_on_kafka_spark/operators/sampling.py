"""Deterministic sampling and dataset-split operators for
training-data pipelines.

Random sampling (``df.sample``/TABLESAMPLE) is nondeterministic across
partitionings and engines; a 10^12-doc pipeline needs sampling that is
(a) stable under re-runs, repartitions and backfills, (b) reproducible
by an external auditor.  Everything here derives from the engine's
portable md5 hash (``dedup._hash64``: first 15 hex digits of
md5(seed || ':' || value) — 60 bits), uniform in [0, 2^60), so an
external SQL engine reproduces every membership decision bit-exactly.

All operators are pure Catalyst projections/filters/windows (no Python,
no shuffle except the stratified cap's per-key window — which should be
keyed at domain/lang granularity exactly like any per-key top-n).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from kelos_on_kafka_spark.operators.dedup import _hash64

_SCALE = float(2**60)


def _unit_hash(col: Column, seed: int) -> Column:
    """Deterministic uniform [0, 1) from a column value."""
    return _hash64(col.cast("string"), seed) / F.lit(_SCALE)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep a stable ~``fraction`` of rows: membership depends only on
    (seed, id), never on partitioning or engine.  Nested samples
    compose: fraction 0.1 of the same seed is a superset of 0.05."""
    return df.where(_unit_hash(F.col(id_col), seed) < F.lit(float(fraction)))


def split_bounds(weights: dict[str, float]) -> list[tuple[str, float]]:
    """Cumulative [0, 1) bounds for ``hash_split``, accumulated exactly
    (Fraction) and rounded to double ONCE per bound — so 0.8 + 0.1
    yields the double 0.9, not 0.9000000000000000(4).  A hand-written
    oracle can therefore use ``repr(bound)`` literals (0.9 for weights
    .8/.1/.1) and bit-match the Spark plan's comparison constants; a
    float-accumulated bound would disagree with the literal on a
    ~1-ulp interval and break cross-engine membership parity."""
    names = list(weights)
    cum = Fraction(0)
    bounds: list[tuple[str, float]] = []
    for name in names[:-1]:
        cum += Fraction(float(weights[name]))
        bounds.append((name, float(cum)))
    return bounds


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test …)
    by cumulative hash bucket.  Weights must sum to ~1; the last split
    absorbs rounding so every row is assigned.  Bucket bounds come from
    ``split_bounds`` (exact accumulation) so oracle literals match."""
    names = list(weights)
    bounds = split_bounds(weights)
    u = _unit_hash(F.col(id_col), seed)
    # build the when-cascade from the last bound outward so the FIRST
    # matching (smallest) bound wins
    chain = F.lit(names[-1])
    for name, bound in reversed(bounds):
        chain = F.when(u < F.lit(bound), F.lit(name)).otherwise(chain)
    return df.withColumn(out_col, chain)


def stratified_cap(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    n: int,
    seed: int = 0,
) -> DataFrame:
    """Cap each key (domain, lang, source …) to at most ``n`` rows,
    chosen by hash order — an unbiased per-key subsample that is stable
    under re-runs and engine-portable (the pretraining "max N pages per
    domain" balance op).  Adds ``sample_rank`` (1-based)."""
    w = Window.partitionBy(*key_cols).orderBy(
        _hash64(F.col(id_col).cast("string"), seed).asc(),
        F.col(id_col).asc(),
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n)
    )


def weighted_priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    seed: int = 7,
    max_weight: int = 64,
) -> DataFrame:
    """EXACT weighted sampling without replacement, deterministic and
    engine-portable: each row's priority is the MIN of ``w`` iid
    portable hashes (one per weight unit) and the ``n`` smallest
    priorities win.

    Why this is exact: replicate each row into ``w`` copies, give every
    copy an iid uniform, and scan copies in priority order — that is
    uniform sampling over the weight multiset, so the order in which
    DISTINCT rows first appear is successive sampling proportional to
    remaining weights (weighted sampling without replacement).  A row's
    first appearance is at its min copy priority — which is exactly
    this operator's sort key.  Integer weights only (``max_weight``
    bounds the per-row hash count); no float pow/ln, so there is no
    cross-engine ulp hazard (cf. the measured JVM-vs-DuckDB ln
    divergence documented at textstats.top_terms_tfidf).

    Plan: a per-row O(w) projection then TakeOrdered (map-side partial
    top-n, no global sort shuffle).  Returns the sampled rows plus
    ``priority``."""
    pri = _min_of_w_priority(id_col, weight_col, seed, max_weight)
    return (
        df.where(F.col(weight_col) >= 1)
        .withColumn("priority", pri)
        .orderBy(F.col("priority").asc(), F.col(id_col).asc())
        .limit(n)
    )


def _min_of_w_priority(
    id_col: str, weight_col: str, seed: int, max_weight: int
) -> Column:
    """Min-of-w portable-hash priority (see weighted_priority_sample)."""
    w = F.least(F.col(weight_col).cast("int"), F.lit(max_weight))
    return F.array_min(
        F.transform(
            F.sequence(F.lit(0), w - 1),
            lambda i: _hash64(
                F.concat_ws(":", F.col(id_col).cast("string"), i), seed
            ),
        )
    )


def weighted_stratified_cap(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    weight_col: str,
    n: int,
    seed: int = 7,
    max_weight: int = 64,
) -> DataFrame:
    """Per-stratum exact weighted sampling without replacement: within
    each key (domain, lang, source …) keep the ``n`` rows with the
    smallest min-of-w portable-hash priorities — i.e.
    ``weighted_priority_sample`` applied independently per stratum, as
    one window pass (the weighted form of ``stratified_cap``; same
    exactness argument as weighted_priority_sample, per stratum).

    Plan: O(w) projection + one shuffle on the strata keys; hot strata
    route through ``plans.skew.salted_topn`` with the same (priority,
    id) order if needed.  Adds ``priority`` and ``sample_rank``."""
    pri = _min_of_w_priority(id_col, weight_col, seed, max_weight)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("priority").asc(), F.col(id_col).asc()
    )
    return (
        df.where(F.col(weight_col) >= 1)
        .withColumn("priority", pri)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n)
    )
