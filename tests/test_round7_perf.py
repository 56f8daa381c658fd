"""Round-7 optimization guards: every rewrite this round must be
result-identical to the r06 semantics it replaced.  These tests pin the
equivalences the OPTIMIZATION_r07.md claims rest on."""

from pyspark.sql import functions as F


def test_prefix_hashed_path_identical_to_string_path(spark):
    """q_jaccard_prefix now runs hash_shingles=True: the hashed rank
    order differs (xxhash64 longs, not strings) but verification
    recomputes exact intersections, so the OUTPUT must be identical on
    the committed corpora."""
    from kelos_on_kafka_spark.operators.dedup import (
        ngram_jaccard_prefix_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    raw = sorted(
        tuple(r)
        for r in ngram_jaccard_prefix_pairs(
            docs, jaccard_num=3, jaccard_den=10, hash_shingles=False
        ).collect()
    )
    fast = sorted(
        tuple(r)
        for r in ngram_jaccard_prefix_pairs(
            docs, jaccard_num=3, jaccard_den=10, hash_shingles=True
        ).collect()
    )
    assert raw == fast and len(raw) > 0


def test_prefix_k2_tiny_doc_edge_is_lossless(spark):
    """The k=2 pigeonhole filter must fall back to k=1 when a pair's
    overlap floor max(ceil(t*n_a), ceil(t*n_b)) is below 2 — tiny docs
    can pass the threshold while sharing only ONE shingle.  Docs of 2
    shingles at t=3/10 (o_pair=1, J=1/3 via one shared shingle) catch
    a naive `shared >= 2` over-prune."""
    from kelos_on_kafka_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_prefix_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),   # shingles {a b c, b c d}
            (2, "a b c e"),   # shingles {a b c, b c e} -> J = 1/3
            (3, "x y z w"),   # unrelated
        ],
        "doc_id long, text string",
    )
    got = sorted(
        tuple(r)
        for r in ngram_jaccard_prefix_pairs(
            docs, jaccard_num=3, jaccard_den=10
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(
            docs, min_jaccard_pct=30, max_doc_freq=10**9
        ).collect()
    )
    assert got == want
    assert (1, 2, 1, 3) in got  # the one-shared-shingle pair survives


def test_explode_outer_front_end_drops_empty_docs(spark):
    """The array front end must treat NULL/empty/short texts exactly
    like the r06 explode+filter chain: no posting rows, no pairs, no
    crash."""
    from kelos_on_kafka_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   "),
            (4, "one two"),  # single 2-token shingle
            (5, "one two"),
            (6, "alpha beta gamma delta"),
        ],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(docs, min_jaccard_pct=10).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(4, 5)}
    cont = containment_pairs(docs, min_containment_pct=80).collect()
    assert {(r.doc_a, r.doc_b) for r in cont} == {(4, 5)}


def test_lsh_bucket_pair_generation_matches_self_join(spark):
    """The in-row per-bucket pair generation must emit exactly the
    pair set of the r06 window+self-join form (doc_a < doc_b, distinct
    across bands, oversized buckets dropped)."""
    from pyspark.sql.window import Window

    from kelos_on_kafka_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sigs = minhash_signatures(docs, n_hashes=16, shingle_words=3)
    got = sorted(
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(
            sigs, n_bands=4, rows_per_band=4, portable=True
        ).collect()
    )

    def _bucket(b, rows_per_band=4):
        vals = [
            F.element_at("minhash", b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
        return F.md5(F.concat_ws(",", *[v.cast("string") for v in vals]))

    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), _bucket(b).alias("bucket")
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    sized = bands.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
    ).where(F.col("n") <= 1000)
    left = sized.select("band", "bucket", F.col("doc_id").alias("doc_a"))
    right = sized.select("band", "bucket", F.col("doc_id").alias("doc_b"))
    want = sorted(
        (r.doc_a, r.doc_b)
        for r in left.join(right, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    )
    assert got == want and len(got) > 0


def test_packed_pair_key_identical_and_guarded(spark):
    """The packed single-long pair-key aggregate (pack_pairs=True, the
    default) must be row-identical to the two-column aggregate on the
    committed corpus, and the runtime id-range guard must fall back —
    still producing identical rows — when ids don't fit below 2^31."""
    from kelos_on_kafka_spark.operators.dedup import (
        _pair_ids_packable,
        containment_pairs,
        ngram_jaccard_pairs,
        ngram_jaccard_prefix_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert _pair_ids_packable(docs, "doc_id")
    for fn, kw in (
        (ngram_jaccard_pairs, dict(min_jaccard_pct=10)),
        (containment_pairs, dict(min_containment_pct=30)),
        (ngram_jaccard_prefix_pairs, dict(jaccard_num=3, jaccard_den=10)),
    ):
        packed = sorted(
            tuple(r) for r in fn(docs, pack_pairs=True, **kw).collect()
        )
        plain = sorted(
            tuple(r) for r in fn(docs, pack_pairs=False, **kw).collect()
        )
        assert packed == plain and len(packed) > 0

    # ids >= 2^31: the guard must refuse to pack (a blind shiftleft
    # would corrupt pairs) and the fallback must match the small-id run
    big = docs.withColumn("doc_id", F.col("doc_id") + F.lit(1 << 31))
    assert not _pair_ids_packable(big, "doc_id")
    got = sorted(
        (r.doc_a - (1 << 31), r.doc_b - (1 << 31), r.inter, r.union_n)
        for r in ngram_jaccard_pairs(big, min_jaccard_pct=10).collect()
    )
    want = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(docs, min_jaccard_pct=10).collect()
    )
    assert got == want
    # non-integral ids are refused by dtype alone (no probe job)
    assert not _pair_ids_packable(
        docs.withColumn("doc_id", F.col("doc_id").cast("string")), "doc_id"
    )


# --- VERDICT r6 #5: skew exposure of the prefix join's frequency path ---

from hypothesis import HealthCheck, given, settings, strategies as st

_TOKS = ["spark", "sort", "hash", "join", "scan", "agg", "row", "col"]

# docs from a tiny alphabet, half carrying a shared boilerplate prefix
# -> guaranteed hot shingles whose doc-frequency dominates the freq
# join (the skewed-key regime VERDICT r6 #5 flagged)
_DOCS = st.lists(
    st.tuples(
        st.integers(0, 10**6),
        st.booleans(),
        st.lists(st.sampled_from(_TOKS), min_size=3, max_size=10),
    ),
    min_size=2,
    max_size=20,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_DOCS, num=st.sampled_from([3, 5]))
def test_prefix_join_identical_under_hot_shingle_skew(spark, rows, num):
    """On arbitrary corpora with planted boilerplate (hot shingles),
    the k=2-prefix candidate pipeline must remain result-identical to
    the plain uncapped inverted-index join — skew handling (rare-first
    ranking, length filter, pigeonhole count) may only PRUNE
    candidates, never change the verified pair set."""
    from kelos_on_kafka_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_prefix_pairs,
    )

    docs = spark.createDataFrame(
        [
            (i, ("alpha beta gamma " if boil else "") + " ".join(toks))
            for i, boil, toks in rows
        ],
        "doc_id long, text string",
    )
    got = sorted(
        tuple(r)
        for r in ngram_jaccard_prefix_pairs(
            docs, jaccard_num=num, jaccard_den=10
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(
            docs, min_jaccard_pct=10 * num, max_doc_freq=10**9
        ).collect()
    )
    assert got == want
