"""Connected-components group resolution: hand-built graphs (including a
long chain, which exercises pointer jumping / O(log d) convergence) and
the end-to-end near_dup_groups pipeline invariants."""

import pandas as pd
import pytest

from kelos_on_kafka_spark.operators.dedup import (
    connected_components,
    near_dup_groups,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["doc_a", "doc_b"]).astype("int64")
    )
    rows = connected_components(df, **kw).collect()
    return {r.node_id: r.group_id for r in rows}


def test_cc_basic_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (5, 6), (7, 8), (8, 9), (9, 7)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7, 8: 7, 9: 7}


def test_cc_long_chain_converges_logarithmically(spark):
    # path 100-101-...-160: diameter 60, must converge well inside
    # max_iters=10 thanks to the pointer-jumping step (2^10 >> 60)
    edges = [(i, i + 1) for i in range(100, 160)]
    got = _cc(spark, edges, max_iters=10)
    assert set(got.values()) == {100}
    assert len(got) == 61


def test_cc_edge_direction_irrelevant(spark):
    a = _cc(spark, [(4, 2), (2, 9), (9, 4), (11, 10)])
    assert a == {2: 2, 4: 2, 9: 2, 10: 10, 11: 10}


def test_near_dup_groups_transitive_keeper(spark):
    # A~B and B~C by heavy shingle overlap, but A and C differ more:
    # group resolution must still put all three under keeper=min id
    base = "the quick brown fox jumps over the lazy dog " * 6
    a = base + "alpha beta gamma delta"
    b = base + "alpha beta gamma zeta"
    c = base + "alpha theta iota zeta"
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 11, 12, 99],
                "text": [a, b, c, "completely unrelated content here"],
            }
        )
    )
    rows = near_dup_groups(docs, portable=True).collect()
    got = {r.doc_id: r.group_id for r in rows}
    assert got.get(10) == 10 and got.get(11) == 10 and got.get(12) == 10
    assert 99 not in got  # no candidate pair -> not in the pair graph


def test_winnowing_shared_run_guarantee(spark):
    """Winnowing guarantee: two docs sharing a token run of length
    >= window + shingle - 1 (= 6 here) share at least one fingerprint;
    unrelated docs share none."""
    from kelos_on_kafka_spark.operators.dedup import winnow_fingerprints

    common = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "unique one two " + common + " tail here",
                    "other prefix words " + common + " different ending",
                    "wholly unrelated content nothing matches at all",
                ],
            }
        )
    )
    rows = winnow_fingerprints(docs, shingle_words=3, window=4).collect()
    fps = {}
    for r in rows:
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2], "shared run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_cc_matches_union_find_on_random_graphs(spark):
    """Property check: CC output equals a driver-side union-find on
    deterministic pseudo-random edge sets of varying shape."""
    import numpy as np

    def union_find_groups(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in parent}

    rng = np.random.default_rng(77)
    for n_nodes, n_edges in [(30, 20), (50, 80), (200, 120)]:
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, n_nodes, size=(n_edges, 2))
            if a != b
        ]
        if not edges:
            continue
        want = union_find_groups(edges)
        got = _cc(spark, edges)
        assert got == want, (n_nodes, n_edges)


def test_simhash_near_dups_pigeonhole_exactness(spark):
    """Planted near-identical docs are found; reported hamming equals a
    locally computed popcount(xor) of the portable simhashes; no pair
    exceeds the bound."""
    from kelos_on_kafka_spark.operators.dedup import (
        simhash64,
        simhash_near_dup_pairs,
    )

    base = "quick brown fox jumps over lazy dog again and again " * 4
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    base + "ending one",
                    base + "ending two",
                    "totally different words everywhere nothing shared "
                    "at all here believe me",
                ],
            }
        )
    )
    pairs = simhash_near_dup_pairs(docs, max_hamming=6, portable=True).collect()
    sims = {
        r.doc_id: r.simhash
        for r in simhash64(docs, portable=True).collect()
    }
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    assert (1, 2) in got
    for (a, b), h in got.items():
        assert h == bin(sims[a] ^ sims[b]).count("1") and h <= 6
    assert all(3 not in p for p in got)


def test_simhash_near_dups_exact_mode_and_nondivisor_chunks(spark):
    """ADVICE r02: max_hamming=0 used to build a 64-bit all-ones mask
    (LongType overflow at plan time); non-divisor chunk counts left the
    top 64 % n bits out of every chunk.  Exact mode now buckets on the
    full hash, and variable-width chunks cover all 64 bits."""
    from kelos_on_kafka_spark.operators.dedup import (
        simhash64,
        simhash_near_dup_pairs,
    )

    base = "quick brown fox jumps over lazy dog again and again " * 4
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [base + "same", base + "same", base + "other end"],
            }
        )
    )
    # exact-dup mode (n_chunks=1): identical docs found at hamming 0
    exact = simhash_near_dup_pairs(docs, max_hamming=0, portable=True)
    got0 = {(r.doc_a, r.doc_b): r.hamming for r in exact.collect()}
    assert got0 == {(1, 2): 0}
    # non-divisor chunking (max_hamming=4 -> 5 chunks over 64 bits):
    # results still verify against locally computed popcounts
    pairs = simhash_near_dup_pairs(docs, max_hamming=4, portable=True)
    sims = {
        r.doc_id: r.simhash for r in simhash64(docs, portable=True).collect()
    }
    for r in pairs.collect():
        h = bin(sims[r.doc_a] ^ sims[r.doc_b]).count("1")
        assert r.hamming == h and h <= 4
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_dup_pairs(docs, max_hamming=64)


def test_dedup_decisions_composed_and_repartition_stable(spark):
    """dedup_decisions: exact beats near beats keep; the keeper choice
    is identical under an adversarial repartitioning (min-id keepers
    depend only on content and ids)."""
    from kelos_on_kafka_spark.operators.dedup import dedup_decisions

    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        (1, base + "tail one"),       # near-dup of 2
        (2, base + "tail two"),       # near-dup of 1
        (3, base + "tail one"),       # exact dup of 1
        (4, "completely unrelated words with no overlap whatsoever"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.keeper_id, r.reason)
        for r in dedup_decisions(docs, portable=True).collect()
    }
    assert got[3] == (1, "exact")  # exact wins even if also a near-dup
    assert got[4] == (4, "keep")
    assert got[1] == (1, "keep")  # min-id keeper of its component
    # doc 2: near-dup of 1 iff LSH banded them together; either way the
    # verdict must be self-consistent (keeper is a kept doc or itself)
    assert got[2][0] in (1, 2)
    shuffled = {
        r.doc_id: (r.keeper_id, r.reason)
        for r in dedup_decisions(
            docs.repartition(7, "text"), portable=True
        ).collect()
    }
    assert shuffled == got


def test_dedup_decisions_precomputed_groups_path_agrees(spark):
    """dedup_decisions(groups=...): feeding a materialized
    near_dup_groups table (the production shape — groups computed once
    per corpus snapshot) yields exactly the recompute path's verdicts."""
    from kelos_on_kafka_spark.operators.dedup import (
        dedup_decisions,
        near_dup_groups,
    )

    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        (1, base + "tail one"),
        (2, base + "tail two"),
        (3, base + "tail one"),
        (4, "completely unrelated words with no overlap whatsoever"),
        (5, base + "tail three"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    recomputed = sorted(
        map(tuple, dedup_decisions(docs, portable=True).collect())
    )
    groups = near_dup_groups(docs, portable=True)
    fed = sorted(
        map(tuple, dedup_decisions(docs, portable=True, groups=groups).collect())
    )
    assert fed == recomputed
    # and a round-trip through parquet (the actual materialized shape)
    import tempfile

    path = tempfile.mkdtemp(prefix="ndg_") + "/groups"
    groups.write.parquet(path)
    from_disk = sorted(
        map(
            tuple,
            dedup_decisions(
                docs, portable=True, groups=spark.read.parquet(path)
            ).collect(),
        )
    )
    assert from_disk == recomputed


def test_minhash_fast_variant_finds_planted_dups(spark):
    """fast=True (xxhash64) signatures: same shape, same planted-dup
    recall through the banded pipeline as the portable variant."""
    from kelos_on_kafka_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta " * 5
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [base, base, "nothing in common with those docs"],
            }
        )
    )
    sigs = minhash_signatures(docs, fast=True)
    rows = {r.doc_id: list(r.minhash) for r in sigs.collect()}
    assert len(rows[1]) == 16 and rows[1] == rows[2] != rows[3]
    pairs = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(sigs, n_bands=4, rows_per_band=4).collect()
    }
    assert (1, 2) in pairs and all(3 not in p for p in pairs)
