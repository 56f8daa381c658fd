"""windowing.group_percentiles: the exact form stays the driver
contract (oracle-checked via the group_percentiles query); these tests
pin the library surface and the approx form's rank-error bound —
VERDICT r5 what's-missing #4."""

import pytest

from pyspark.sql import functions as F


def _events(spark, n=4000, groups=4):
    # deterministic skewed-ish values, several groups
    return spark.createDataFrame(
        [
            (f"g{i % groups}", float((i * 37) % 1000) ** 1.2)
            for i in range(n)
        ],
        "grp string, value double",
    )


def test_exact_matches_inline_percentile(spark):
    from kelos_on_kafka_spark.operators.windowing import group_percentiles

    df = _events(spark)
    got = {
        r.grp: (r.n_events, r.p50, r.p95)
        for r in group_percentiles(
            df, ["grp"], "value", [0.5, 0.95], exact=True
        ).collect()
    }
    want = {
        r.grp: (r.n, r.p50, r.p95)
        for r in df.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert got == want


def test_approx_within_rank_error_bound(spark):
    """approx_percentile guarantees rank error <= n/accuracy: for each
    group, the rank of the returned value must lie within
    [p*n - n/acc - 1, p*n + n/acc + 1].  Verified against the sorted
    exact values at a deliberately coarse accuracy so the bound is
    actually exercised."""
    from kelos_on_kafka_spark.operators.windowing import group_percentiles

    df = _events(spark, n=6000, groups=3)
    acc = 100  # coarse: allowed rank slack = n/100 = 20 per group
    approx = {
        r.grp: (r.p50, r.p95)
        for r in group_percentiles(
            df, ["grp"], "value", [0.5, 0.95], exact=False, accuracy=acc
        ).collect()
    }
    by_grp = {}
    for r in df.collect():
        by_grp.setdefault(r.grp, []).append(r.value)
    for grp, (a50, a95) in approx.items():
        vals = sorted(by_grp[grp])
        n = len(vals)
        slack = n / acc + 1
        for p, a in ((0.5, a50), (0.95, a95)):
            assert a in vals  # GK returns an observed value
            lo = vals.index(a)  # first rank holding the value
            hi = n - 1 - vals[::-1].index(a)  # last rank
            target = p * n
            assert lo - slack <= target <= hi + slack, (
                grp,
                p,
                a,
                lo,
                hi,
                target,
            )


def test_validation(spark):
    from kelos_on_kafka_spark.operators.windowing import group_percentiles

    with pytest.raises(ValueError, match="non-empty"):
        group_percentiles(_events(spark, 10), ["grp"], "value", [])
