#!/usr/bin/env python
"""Round-6 plan audit: print the executed-plan shape of the new
operators at sf0.01 — verifying (a) canonical_urls is one exchange
(the groupBy) with codegen'd normalization, (b) equidepth_hist is one
group-key exchange + in-partition sort (window) + partial agg,
(c) vocab's ranking window runs AFTER the token aggregation,
(d) adaptive_filter broadcasts the threshold table (no corpus
shuffle), (e) no Python stages anywhere in the four relational plans.

Usage: python BENCH/plan_audit_r6.py [sf_dir]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main():
    import __spark_entry__ as entry
    from kelos_on_kafka_spark.plans.session import get_spark

    spark = get_spark(app_name="plan-audit-r6", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    checks = {
        "canonical_urls": dict(max_exchanges=2, no_python=True),
        "equidepth_hist": dict(max_exchanges=2, no_python=True),
        "vocab": dict(max_exchanges=3, no_python=True),
        "adaptive_filter": dict(
            max_exchanges=2, no_python=True, needs_broadcast=True
        ),
        # session-2 additions: bounds/stats tables must broadcast back
        # onto the fact side; link_stats must stay a pure map stage
        # (fan_out's round-robin widen is the only allowed exchange)
        "winsorized": dict(
            max_exchanges=3, no_python=True, needs_broadcast=True
        ),
        "robust_scaled": dict(
            max_exchanges=3, no_python=True, needs_broadcast=True
        ),
        "cardinality": dict(max_exchanges=3, no_python=True),
        "link_stats": dict(max_exchanges=1, no_python=True),
        "outlink_domains": dict(max_exchanges=3, no_python=True),
        "sq8_codes": dict(
            max_exchanges=3, no_python=True, needs_broadcast=True
        ),
        "sq8_topk": dict(
            max_exchanges=7, no_python=True, needs_broadcast=True
        ),
        "oov_rate": dict(max_exchanges=7, no_python=True),
        # materialize=True checkpoints pairs+tokens: 86 exchanges -> 4
        "cosine_rescore": dict(max_exchanges=6, no_python=True),
        # vocab lookup must broadcast; exploded token stream must not
        # sort-merge anywhere
        "encode_tokens": dict(
            max_exchanges=4, no_python=True, needs_broadcast=True
        ),
        "packed_ids": dict(
            max_exchanges=8, no_python=True, needs_broadcast=True
        ),
        # inverted-index / candidate-pair joins: shuffle-heavy by
        # design but bounded, and the size tables must broadcast
        # 13 == ngram_jaccard's established inverted-index plan shape
        "containment": dict(
            max_exchanges=13, no_python=True, needs_broadcast=True
        ),
        "edit_verify": dict(max_exchanges=14, no_python=True),
    }
    failures = []
    for name, rule in checks.items():
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        has_python = bool(
            re.search(r"ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas", plan)
        )
        has_bcast = "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
        line = (
            f"{name}: exchanges={n_exchange} python={has_python} "
            f"broadcast={has_bcast}"
        )
        print(line)
        if n_exchange > rule["max_exchanges"]:
            failures.append(f"{name}: {n_exchange} exchanges")
        if rule.get("no_python") and has_python:
            failures.append(f"{name}: python stage in plan")
        if rule.get("needs_broadcast") and not has_bcast:
            failures.append(f"{name}: threshold join not broadcast")
    if failures:
        print("FAIL:", failures)
        sys.exit(1)
    print("plan audit OK")
    spark.stop()


if __name__ == "__main__":
    main()
