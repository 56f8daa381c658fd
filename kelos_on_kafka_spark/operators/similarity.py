"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — probes broadcast against the corpus
(never a shuffled cross join), dot products via built-in
``zip_with``/``aggregate`` (JVM-side, no Python).  Scale path: LSH
bucketing by random-hyperplane sign bits, so each probe only scans its
bucket.  Integer-only ranking output keeps the DuckDB oracle exact.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from kelos_on_kafka_spark.plans.layout import fan_out


def md5_planes(seed: int, n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic hyperplane matrix for LSH bucketing, derived from
    md5 so the exact same float constants can be embedded as literals in
    an external SQL oracle: component(p, i) = (h - 2^59) / 2^59 with h
    the first 15 hex digits of md5(f"{seed}:{p}:{i}") — uniform in
    [-1, 1).  Computed driver-side once (n_planes x dim doubles); the
    data-side cost is just literal multiply-adds."""
    return [
        [
            (
                int(
                    hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()[:15],
                    16,
                )
                - 2**59
            )
            / 2**59
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the given probe ids.

    Plan shape: corpus scan -> broadcast join with the tiny probe set ->
    per-row dot/norm (codegen) -> window rank.  Returns
    (probe_id, rank, neighbor_id) — ranking by (cosine desc, neighbor_id)
    with the float kept internal so results are engine-exact."""
    # norms are precomputed as columns: the naive form re-evaluates
    # norm(vec) once per (probe, row) pair and norm(pvec) once per
    # corpus row — x(probes+1) wasted interpreted HOF work.  The value
    # is bit-identical (same sequential fold over the same vector), so
    # oracle parity is unaffected.
    corpus = fan_out(embeddings).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("nrm", _norm(F.col("vec")))
    probes = corpus.where(
        F.col("neighbor_id").isin([int(p) for p in probe_ids])
    ).select(
        F.col("neighbor_id").alias("probe_id"),
        F.col("vec").alias("pvec"),
        F.col("nrm").alias("pnrm"),
    )
    joined = corpus.join(F.broadcast(probes)).where(
        F.col("neighbor_id") != F.col("probe_id")
    )
    scored = joined.select(
        "probe_id",
        "neighbor_id",
        (
            _dot(F.col("pvec"), F.col("vec"))
            / (F.col("pnrm") * F.col("nrm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "rank", "neighbor_id")
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 41,
    max_iter: int = 10,
) -> list[list[float]]:
    """Train the IVF coarse quantizer with distributed k-means
    (pyspark.ml KMeans — kmeans|| init, Catalyst-side aggregation).
    Returns the centroid matrix to pass to ``ivf_topk(centroids=...)``.

    Training cost at scale is a few passes over a SAMPLE of the corpus
    (pass ``embeddings.sample(...)``); the centroid table is tiny and
    broadcast everywhere it is used."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ds = embeddings.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "features"
        )
    )
    model = KMeans(
        k=n_cells, seed=seed, maxIter=max_iter, initMode="k-means||"
    ).fit(ds)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def ivf_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: the second ANN scale path next to
    hyperplane LSH.  Coarse quantizer = the first ``n_cells`` corpus
    vectors (deterministic, engine-portable — a production deployment
    swaps in trained centroids, the plan shape is identical); every
    vector is assigned to its nearest cell by cosine (broadcast join
    against the tiny cell table + window argmin), probes scan their
    ``nprobe`` nearest cells only.  At 100 TB the probe-side scan is
    O(N * nprobe / n_cells) and the assignment is a map-side broadcast
    pass — no all-pairs anywhere.  Returns (probe_id, rank, neighbor_id)
    like the other top-k operators."""
    corpus = fan_out(embeddings).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("nrm", _norm(F.col("vec")))
    if centroids is not None:
        # trained quantizer (train_ivf_centroids): tiny literal table,
        # broadcast below exactly like the deterministic default
        cells = embeddings.sparkSession.createDataFrame(
            [
                (i, [float(x) for x in c])
                for i, c in enumerate(centroids)
            ],
            "cell_id long, cvec array<double>",
        ).withColumn("cnrm", _norm(F.col("cvec")))
    else:
        cells = corpus.where(F.col("vid") < n_cells).select(
            F.col("vid").alias("cell_id"),
            F.col("vec").alias("cvec"),
            F.col("nrm").alias("cnrm"),
        )
    scored_cells = corpus.join(F.broadcast(cells)).select(
        "vid",
        "vec",
        "nrm",
        "cell_id",
        (
            _dot(F.col("vec"), F.col("cvec"))
            / (F.col("nrm") * F.col("cnrm"))
        ).alias("csim"),
    )
    w_assign = Window.partitionBy("vid").orderBy(
        F.col("csim").desc(), F.col("cell_id").asc()
    )
    ranked = scored_cells.withColumn("crn", F.row_number().over(w_assign))
    assigned = ranked.where(F.col("crn") == 1).select(
        F.col("vid").alias("neighbor_id"),
        "vec",
        "nrm",
        "cell_id",
    )
    probe_cells = ranked.where(
        (F.col("crn") <= nprobe)
        & F.col("vid").isin([int(p) for p in probe_ids])
    ).select(
        F.col("vid").alias("probe_id"),
        F.col("vec").alias("pvec"),
        F.col("nrm").alias("pnrm"),
        F.col("cell_id").alias("pcell"),
    )
    joined = assigned.join(
        F.broadcast(probe_cells), F.col("cell_id") == F.col("pcell")
    ).where(F.col("neighbor_id") != F.col("probe_id"))
    scored = joined.select(
        "probe_id",
        "neighbor_id",
        (
            _dot(F.col("pvec"), F.col("vec"))
            / (F.col("pnrm") * F.col("nrm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "rank", "neighbor_id")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 41,
    planes: list[list[float]] | None = None,
    max_bucket: int = 10000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: the dedup modality for
    corpora where duplicates are semantic (same page re-rendered,
    translated boilerplate) rather than textual.

    Plan: LSH-bucket the corpus by hyperplane sign bits, all-pairs ONLY
    within buckets (never a cross join; ``max_bucket`` guards degenerate
    buckets like the banded-minhash path), cosine >= ``threshold``
    filter with precomputed norms.  Returns (vec_a, vec_b) with
    vec_a < vec_b.  Recall/cost trade-off is ``n_planes``: a candidate
    pair lands in the same bucket with probability (1 - theta/pi)^planes.
    ``planes`` (see ``md5_planes``) makes the bucketing SQL-reproducible."""
    if planes is not None:
        n_planes = len(planes)
    corpus = fan_out(embeddings).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )

    def bucket_of(vec):
        acc = F.lit(0).cast("long")
        for p in range(n_planes):
            if planes is not None:
                dot = F.lit(0.0)
                for i, c in enumerate(planes[p]):
                    dot = dot + F.element_at(vec, i + 1) * F.lit(float(c))
            else:
                dot = F.aggregate(
                    F.zip_with(
                        vec,
                        F.transform(
                            F.sequence(F.lit(0), F.size(vec) - 1),
                            lambda i: (
                                F.xxhash64(F.lit(f"{seed}:{p}"), i).cast(
                                    "double"
                                )
                                / F.lit(float(2**63))
                            ),
                        ),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            acc = acc + F.when(
                dot >= 0, F.shiftleft(F.lit(1).cast("long"), p)
            ).otherwise(F.lit(0).cast("long"))
        return acc

    bucketed = corpus.withColumn("bucket", bucket_of(F.col("vec"))).withColumn(
        "nrm", _norm(F.col("vec"))
    )
    sized = bucketed.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("bucket"))
    ).where(F.col("n") <= max_bucket)
    left = sized.select(
        "bucket",
        F.col("vid").alias("vec_a"),
        F.col("vec").alias("va"),
        F.col("nrm").alias("na"),
    )
    right = sized.select(
        "bucket",
        F.col("vid").alias("vec_b"),
        F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        left.join(right, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(
            _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            >= F.lit(float(threshold))
        )
        .select("vec_a", "vec_b")
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 41,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane sign-bit bucketing; probes
    scan only their own bucket.  Hyperplanes are deterministic
    (hash-seeded per (plane, dim)), so the bucketing is reproducible.
    At 100 TB this turns an O(N) probe scan into O(N / 2^n_planes).

    ``planes``: explicit hyperplane matrix (e.g. from ``md5_planes``) —
    components become float literals and the dot product an explicit
    left-to-right multiply-add chain, so an external SQL oracle with the
    same literals reproduces the buckets bit-exactly.  Default (None)
    derives components from xxhash64 inside the plan (JVM-only but no
    literal blow-up for very high dims)."""
    if planes is not None:
        n_planes = len(planes)
    corpus = fan_out(embeddings).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )

    # deterministic pseudo-random hyperplane component for (plane, dim):
    # centered 64-bit hash scaled to [-1, 1]
    def plane_component(p: int, i):
        h = F.xxhash64(F.lit(f"{seed}:{p}"), i)
        return (h.cast("double") / F.lit(float(2**63)))

    def bucket_of(vec):
        acc = F.lit(0).cast("long")
        for p in range(n_planes):
            if planes is not None:
                # explicit sequential chain: same float-op order as the
                # generated SQL (Catalyst does not reassociate FP adds)
                dot = F.lit(0.0)
                for i, c in enumerate(planes[p]):
                    dot = dot + F.element_at(vec, i + 1) * F.lit(float(c))
            else:
                dot = F.aggregate(
                    F.zip_with(
                        vec,
                        F.transform(
                            F.sequence(F.lit(0), F.size(vec) - 1),
                            lambda i: plane_component(p, i),
                        ),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            acc = acc + F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
        return acc

    bucketed = corpus.withColumn("bucket", bucket_of(F.col("vec"))).withColumn(
        "nrm", _norm(F.col("vec"))
    )
    probes = bucketed.where(
        F.col("neighbor_id").isin([int(p) for p in probe_ids])
    ).select(
        F.col("neighbor_id").alias("probe_id"),
        F.col("vec").alias("pvec"),
        F.col("bucket").alias("pbucket"),
        F.col("nrm").alias("pnrm"),
    )
    joined = bucketed.join(
        F.broadcast(probes), F.col("bucket") == F.col("pbucket")
    ).where(F.col("neighbor_id") != F.col("probe_id"))
    scored = joined.select(
        "probe_id",
        "neighbor_id",
        (
            _dot(F.col("pvec"), F.col("vec"))
            / (F.col("pnrm") * F.col("nrm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "rank", "neighbor_id")
    )


def md5_codebooks(
    seed: int, m: int, k_sub: int, subdim: int
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks (m subspaces x k_sub centroids x
    subdim components) derived from md5 exactly like ``md5_planes`` —
    the same float constants embed as literals in an external SQL
    oracle, so the full PQ pipeline (encode + ADC) is cross-engine
    verifiable.  Production swaps in ``train_pq_codebooks`` (KMeans);
    the plan shape is identical."""
    return [
        [
            [
                (
                    int(
                        hashlib.md5(
                            f"{seed}:{j}:{c}:{i}".encode()
                        ).hexdigest()[:15],
                        16,
                    )
                    - 2**59
                )
                / 2**59
                for i in range(subdim)
            ]
            for c in range(k_sub)
        ]
        for j in range(m)
    ]


def train_pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    k_sub: int = 16,
    vec_col: str = "embedding",
    seed: int = 41,
    max_iter: int = 10,
) -> list[list[list[float]]]:
    """Train real PQ codebooks: one distributed KMeans per subspace
    over the sliced sub-vectors (pyspark.ml, same machinery as
    ``train_ivf_centroids``).  Train on a SAMPLE at scale; the result
    is m*k_sub*subdim floats — tiny, broadcast as literals."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    d = len(embeddings.select(vec_col).first()[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sd = d // m
    books = []
    base = embeddings.select(
        F.col(vec_col).cast("array<double>").alias("v")
    )
    for j in range(m):
        ds = base.select(
            array_to_vector(
                F.slice(F.col("v"), j * sd + 1, sd)
            ).alias("features")
        )
        model = KMeans(
            k=k_sub, seed=seed + j, maxIter=max_iter, initMode="k-means||"
        ).fit(ds)
        books.append(
            [[float(x) for x in c] for c in model.clusterCenters()]
        )
    return books


def pq_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 0,
) -> DataFrame:
    """Product-quantization approximate top-k — the third ANN scale
    path next to hyperplane LSH and IVF, and the one that COMPRESSES:
    each vector is stored as m small codes (m bytes at k_sub<=256)
    instead of d doubles, so a 10^12-vector index fits a memory budget
    d/m * 8x smaller.

    Plan (the asymmetric-distance shape of Jegou et al.'s PQ) — all
    SMALL expressions against a broadcast centroid TABLE (an earlier
    draft inlined the codebooks as literal expression trees; Catalyst
    spent seconds compiling them and projection collapse re-evaluated
    the encode per pair — the table form is ~8x faster end-to-end and
    bit-identical, because zip_with/aggregate folds left-to-right in
    exactly the oracle's chain order):
    - encode: corpus x broadcast(m*k_sub cells) -> per-(vector,
      subspace) squared L2 -> argmin window -> one (id, codes) row;
      only ids + codes flow on;
    - probes build their per-subspace distance TABLE the same way and
      broadcast it;
    - ADC: approx dist = sum over subspaces of table[code] — m array
      lookups per (probe, neighbor) pair, never d multiplies;
    - per-probe top-k window on the approximate distance.

    ``rerank > 0`` adds the standard accuracy stage: an ADC shortlist
    of that size per probe is re-scored with EXACT L2 (joining the raw
    vectors back for shortlist rows only).  Returns (probe_id, rank,
    neighbor_id, dist) ranked by (dist asc, neighbor_id asc); ``dist``
    is the ADC approximation when rerank=0, exact squared L2 after
    re-ranking otherwise."""
    m = len(codebooks)
    k_sub = len(codebooks[0])
    sd = len(codebooks[0][0])
    spark = embeddings.sparkSession
    cells = spark.createDataFrame(
        [
            (j, c, [float(x) for x in codebooks[j][c]])
            for j in range(m)
            for c in range(k_sub)
        ],
        "j int, c int, cvec array<double>",
    )
    corpus = fan_out(embeddings).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )

    def subdist(df):
        # squared L2 of the j-th sub-vector to the cell centroid,
        # folded left-to-right (0.0 + t0 + t1 + ...) — the oracle's
        # float-op order
        return F.aggregate(
            F.zip_with(
                F.slice(F.col("vec"), F.col("j") * sd + 1, sd),
                F.col("cvec"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sub = corpus.join(F.broadcast(cells)).select(
        "vid", "j", "c", subdist(None).alias("d")
    )
    # argmin via min_by over struct(d, c) — one map-side-combinable
    # hash aggregation, no sort-window; (min d, tiebreak min c) is
    # exactly the oracle's list_position(list, list_min) choice
    encoded = (
        sub.groupBy("vid", "j")
        .agg(F.min_by("c", F.struct("d", "c")).alias("c"))
        .groupBy("vid")
        .agg(F.array_sort(F.collect_list(F.struct("j", "c"))).alias("jc"))
        .select(
            "vid",
            # 1-based codes, matching the oracle's list_position
            F.transform(F.col("jc"), lambda s: s["c"] + 1).alias("codes"),
        )
    )
    psub = (
        corpus.where(F.col("vid").isin([int(p) for p in probe_ids]))
        .join(F.broadcast(cells))
        .select(F.col("vid").alias("probe_id"), "j", "c", subdist(None).alias("d"))
    )
    ptab = (
        psub.groupBy("probe_id", "j")
        .agg(F.array_sort(F.collect_list(F.struct("c", "d"))).alias("cd"))
        .select(
            "probe_id",
            "j",
            F.transform(F.col("cd"), lambda s: s["d"]).alias("tj"),
        )
        .groupBy("probe_id")
        .agg(F.array_sort(F.collect_list(F.struct("j", "tj"))).alias("jt"))
        .select(
            "probe_id",
            F.transform(F.col("jt"), lambda s: s["tj"]).alias("tab"),
        )
    )
    joined = encoded.join(F.broadcast(ptab)).where(
        F.col("vid") != F.col("probe_id")
    )
    approx = F.lit(0.0)
    for j in range(m):
        approx = approx + F.element_at(
            F.element_at(F.col("tab"), j + 1),
            F.element_at(F.col("codes"), j + 1).cast("int"),
        )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    adc_ranked = (
        joined.select(
            "probe_id",
            F.col("vid").alias("neighbor_id"),
            approx.alias("dist"),
        )
        .withColumn("rank", F.row_number().over(w))
    )
    if not rerank:
        return adc_ranked.where(F.col("rank") <= k).select(
            "probe_id", "rank", "neighbor_id", "dist"
        )
    shortlist = adc_ranked.where(F.col("rank") <= max(rerank, k)).select(
        "probe_id", "neighbor_id"
    )
    pvecs = corpus.where(
        F.col("vid").isin([int(p) for p in probe_ids])
    ).select(F.col("vid").alias("probe_id"), F.col("vec").alias("pvec"))
    exact = (
        shortlist.join(
            corpus.select(F.col("vid").alias("neighbor_id"), "vec"),
            "neighbor_id",
        )
        .join(F.broadcast(pvecs), "probe_id")
        .select(
            "probe_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with(
                    F.col("pvec"), F.col("vec"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dist"),
        )
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "rank", "neighbor_id", "dist")
    )


def kmeans_assign(
    embeddings: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """One k-means ASSIGNMENT step over the corpus: every vector to its
    nearest centroid by cosine — (vec_id, cell_id).  Same deterministic
    quantizer as ``ivf_topk`` (first ``n_cells`` corpus vectors, or
    trained ``centroids``), so this is also the IVF partition map a
    corpus re-bucketing job materializes.  Integer-only output (the
    float similarity stays internal — same driver contract as knn_pq).

    Scale shape: ZERO shuffle for the assignment itself — the centroid
    table travels as one broadcast array-of-structs row (the
    stream-ANN routing pattern) and the argmax is a scalar
    array_sort fold per vector inside codegen.  A groupBy/max_by
    formulation would compile to a SortAggregate behind a full
    corpus shuffle on the vector id (measured: Exchange + double Sort
    in the executed plan); this form touches each row exactly once in
    its scan partition."""
    c = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", _norm(F.col("v")))
    if centroids is not None:
        cells = c.sparkSession.createDataFrame(
            [(i, [float(x) for x in vec]) for i, vec in enumerate(centroids)],
            "cell_id long, cv array<double>",
        ).withColumn("cnrm", _norm(F.col("cv")))
    else:
        cells = c.where(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("cell_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cnrm"),
        )
    cells_arr = cells.select(
        F.struct("cell_id", "cv", "cnrm").alias("s")
    ).agg(F.array_sort(F.collect_list("s")).alias("cells_arr"))
    # per-row argmax: sort (−sim, cell_id) structs ascending and take
    # the head — ties break to the LOWEST cell id, and NULL sims
    # (zero-norm vectors) are pushed last via +inf, both matching the
    # oracle's ORDER BY sim DESC NULLS LAST, cell_id
    best = F.element_at(
        F.array_sort(
            F.transform(
                F.col("cells_arr"),
                lambda cell: F.struct(
                    F.coalesce(
                        -F.try_divide(
                            _dot(F.col("v"), cell["cv"]),
                            F.col("nrm") * cell["cnrm"],
                        ),
                        F.lit(float("inf")),
                    ).alias("negs"),
                    cell["cell_id"].alias("cell_id"),
                ),
            )
        ),
        1,
    )["cell_id"]
    return c.join(F.broadcast(cells_arr)).select(
        "vec_id", best.alias("cell_id")
    )


def cluster_sizes(
    embeddings: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Cluster-occupancy report over ``kmeans_assign``: (cell_id,
    n_vectors, min_vec_id) — the balance check a pipeline runs before
    committing an IVF layout (empty or overloaded cells mean the
    quantizer needs retraining).  One broadcast projection + one
    map-side-combinable aggregation."""
    assigned = kmeans_assign(
        embeddings, n_cells, id_col=id_col, vec_col=vec_col,
        centroids=centroids,
    )
    return assigned.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("vec_id").alias("min_vec_id"),
    )


def sq8_codes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
) -> DataFrame:
    """Per-dimension SCALAR QUANTIZATION (SQ8): corpus min/max per
    dimension -> code = clamp(floor((v - min) / (max - min) * levels))
    in 0..levels-1 — the standard 4x memory cut for ANN indexes
    (float32 -> uint8 per component) that PQ's codebooks overshoot
    when you just need cheap compression.  Returns the EXPLODED
    (vec_id, dim, code) view — SQL-oracle-checkable; ``sq8_pack``
    gives the packed array form.

    Engine-portable by construction: min/max are comparisons (no
    rounding), the affine chain subtract->divide->multiply->floor is
    correctly rounded IEEE on doubles, and a constant dimension
    (max == min) codes to 0 instead of dividing by zero.

    Scale shape: one shuffle keyed on dim (<= vector width keys, each
    a partial min/max — map-side combined); the stats table is |dims|
    rows so the join back broadcasts.  At 10^12 vectors nothing but
    (id, dim, value) triples moves, and the packed form never
    explodes at all."""
    ex = fan_out(df).select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("dim", "v")
    ).withColumn("v", F.col("v").cast("double"))
    stats = ex.groupBy("dim").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.least(
            F.lit(levels - 1).cast("long"),
            F.floor(
                (F.col("v") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * F.lit(float(levels))
            ),
        ),
    ).otherwise(F.lit(0).cast("long"))
    return ex.join(F.broadcast(stats), "dim").select(
        F.col(id_col), "dim", code.alias("code")
    )


def sq8_pack(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
) -> DataFrame:
    """Packed SQ8: (id, codes array<long>, mins, maxs) via a broadcast
    ONE-ROW stats table (the stream-ANN static-row pattern,
    ann_stream.py) and an indexed ``transform`` — the corpus never
    explodes, so this is a pure map stage after the tiny stats agg.
    Same code values as ``sq8_codes`` (tests pin the equivalence);
    carrying mins/maxs makes the codes self-describing for
    de-quantization (error <= (max-min)/levels per component)."""
    ex = df.select(
        F.posexplode(F.col(vec_col)).alias("dim", "v")
    ).withColumn("v", F.col("v").cast("double"))
    stats = (
        ex.groupBy("dim")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mn"))
            ).alias("mns"),
            F.array_sort(
                F.collect_list(F.struct("dim", "mx"))
            ).alias("mxs"),
        )
        .select(
            F.transform("mns", lambda s: s.mn).alias("mins"),
            F.transform("mxs", lambda s: s.mx).alias("maxs"),
        )
    )
    quant = (
        lambda v, mn, mx: F.when(
            mx > mn,
            F.least(
                F.lit(levels - 1).cast("long"),
                F.floor((v.cast("double") - mn) / (mx - mn) * F.lit(float(levels))),
            ),
        ).otherwise(F.lit(0).cast("long"))
    )
    return df.crossJoin(F.broadcast(stats)).select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda v, i: quant(
                v,
                F.element_at(F.col("mins"), i + 1),
                F.element_at(F.col("maxs"), i + 1),
            ),
        ).alias("codes"),
        "mins",
        "maxs",
    )


def sq8_topk(
    packed: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k neighbor search directly over SQ8 codes (``sq8_pack``
    output): score = INTEGER dot product of the code arrays — the
    memory-bound ANN scan that quantization exists for (4x less data
    per row than float32, exact integer arithmetic, so the ranking is
    engine-portable with no float tolerance at all).  Returns
    (probe_id, rank, neighbor_id, dot) ranked by (dot desc,
    neighbor_id asc).

    Same plan shape as ``cosine_topk``: corpus scan -> broadcast join
    with the tiny probe set -> codegen'd zip_with/aggregate fold ->
    per-probe window rank.  At 10^12 vectors the scan is the cost and
    codes cut it 4x; pair with ``ivf_topk``'s cell routing when a
    full scan is still too much."""
    corpus = fan_out(packed).select(
        F.col(id_col).alias("neighbor_id"), F.col("codes").alias("cv")
    )
    probes = corpus.where(
        F.col("neighbor_id").isin([int(p) for p in probe_ids])
    ).select(
        F.col("neighbor_id").alias("probe_id"), F.col("cv").alias("pcv")
    )
    joined = corpus.join(F.broadcast(probes)).where(
        F.col("neighbor_id") != F.col("probe_id")
    )
    dot = F.aggregate(
        F.zip_with(F.col("pcv"), F.col("cv"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = joined.select("probe_id", "neighbor_id", dot.alias("dot"))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "rank", "neighbor_id", "dot")
    )
