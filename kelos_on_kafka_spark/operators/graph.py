"""Link-graph analytics over web-domain edges — the crawl-prior /
spam-prior layer of a Common-Crawl pipeline (north_rule's web-page
table made graph-shaped: ``extract_links`` → domain edges → ranks).

Design for 10^12 pages: the edge table is the big thing (it shuffles
on src for the degree/rank joins, once per iteration), the rank table
is node-grained (domains, orders of magnitude smaller) and co-shuffles
on the same key so the exchange is reused; each iteration ends in a
``localCheckpoint`` so Catalyst never sees an N-iteration plan (the
repo-wide iterative-loop invariant, same as the connected-components
operator in operators/dedup.py).

Numerics are pure INTEGER: ranks live in micro-units (``scale`` per
node initially) and every step is integer floor-division (Spark
``div`` / SQL ``//``), so two engines — or two cluster sizes — agree
bit-for-bit with no float-summation-order caveats.  That makes the
operator oracle-checkable by an unrolled ANSI-SQL CTE chain, which a
damped-float PageRank never is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank_integer(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Fixed-iteration PageRank in integer micro-units.

    rank_0(v) = scale;
    rank_{t+1}(v) = (scale - scale*dn div dd)
                    + dn * (SUM over in-edges u->v of
                            rank_t(u) div outdeg(u)) div dd

    Multi-edges are collapsed and self-loops dropped before ranking;
    dangling nodes (no out-edges) keep receiving rank but leak their
    own mass — the standard simplification (a redistribution term
    would need a global scalar per iteration; at domain granularity
    the leaked mass only rescales, never reorders).  Floor division
    drops at most ``outdeg`` micro-units per node per step — ~1e-6
    relative, far below any ranking decision threshold.

    Returns (node, rank) for every node in the graph.
    """
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .where(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    # every iteration re-reads edges/nodes/degrees: materialize them
    # once (same pattern as the connected-components operator) so the
    # source scan + distinct shuffles run once, not once per iteration
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = scale - (scale * damping_num) // damping_den

    ranks = nodes.select(
        "node", F.lit(int(scale)).cast("long").alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            e.join(deg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("c"),
            )
        )
        inc = contrib.groupBy("node").agg(F.sum("c").alias("inc"))
        ranks = nodes.join(inc, "node", "left").select(
            "node",
            F.expr(
                f"CAST({base} + ({damping_num} * coalesce(inc, "
                f"CAST(0 AS BIGINT))) div {damping_den} AS BIGINT)"
            ).alias("rank"),
        )
        # truncate the iterative lineage (repo invariant: persist does
        # not cut the plan; analysis cost compounds per round)
        ranks = ranks.localCheckpoint(eager=True)
    return ranks
