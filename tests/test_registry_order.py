"""Registry-order guard (VERDICT r3 item 3).

The external driver's correctness gate records only the FIRST 50
entries of ``queries()``.  Round 3 lost driver coverage for 19 queries
(and silently un-gated two formerly-green ones) by appending/inserting
entries without tracking the window.  This test makes that class of
regression impossible: every registered query that has never produced a
satisfied driver row in a committed ``CORRECTNESS_r*.json`` must sit
inside the 50-entry window, so the NEXT driver run gates it.
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entry

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE_WINDOW = 50


def _driver_satisfied() -> set[str]:
    """Keys that some committed driver artifact verified: hash-green,
    or the documented rows-only path (no_oracle with rows recorded)."""
    ok = set()
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        for key, row in json.load(open(path)).items():
            if row.get("hash_match") is True:
                ok.add(key)
            elif row.get("err") == "no_oracle" and row.get("spark_rows"):
                ok.add(key)
    return ok


def test_never_gated_queries_sit_inside_driver_window():
    keys = list(entry.queries())
    assert len(keys) == len(set(keys))
    satisfied = _driver_satisfied()
    past_window = [k for k in keys[GATE_WINDOW:] if k not in satisfied]
    assert not past_window, (
        f"queries never verified by a driver CORRECTNESS artifact sit "
        f"past position {GATE_WINDOW} and would never be gated: "
        f"{past_window} — move them to the front of queries()"
    )


def test_oracle_keys_subset_of_queries():
    q = set(entry.queries())
    extra = set(entry.oracle_sql()) - q
    assert not extra, f"oracle_sql keys without a query: {sorted(extra)}"
