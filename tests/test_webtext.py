"""webtext operators: host/registered-domain extraction and per-domain
rollup/caps (operators/webtext.py)."""

import pytest
from pyspark.sql import functions as F

from kelos_on_kafka_spark.operators import webtext


@pytest.fixture(scope="module")
def urls(spark):
    rows = [
        (1, "https://news.bbc.co.uk/politics/1", "alpha beta gamma"),
        (2, "http://WWW.Example.COM:8080/x?q=1", "one two"),
        (3, "https://example.com/y", "three four five six"),
        (4, "ftp://sub.a.example.com/z", "seven"),
        (5, "not a url at all", "eight nine"),
        (6, "https://localhost/p", "ten"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def test_host_extraction(urls):
    got = {
        r.doc_id: r.h
        for r in urls.select(
            "doc_id", webtext.url_host().alias("h")
        ).collect()
    }
    assert got == {
        1: "news.bbc.co.uk",
        2: "www.example.com",  # port stripped, lower-cased
        3: "example.com",
        4: "sub.a.example.com",
        5: "",  # unparseable -> empty, never null
        6: "localhost",
    }


def test_registered_domain(urls):
    got = {
        r.doc_id: r.d
        for r in urls.select(
            "doc_id",
            webtext.registered_domain(webtext.url_host()).alias("d"),
        ).collect()
    }
    # last-two-labels heuristic: co.uk is the documented limitation
    assert got == {
        1: "co.uk",
        2: "example.com",
        3: "example.com",
        4: "example.com",
        5: "",
        6: "localhost",  # single label maps to itself
    }


def test_domain_stats_rollup(urls):
    got = {
        r.domain: (r.n_docs, r.n_tokens, r.n_hosts, r.first_doc_id)
        for r in webtext.domain_stats(urls).collect()
    }
    # example.com: docs 2,3,4 over hosts www.example.com / example.com /
    # sub.a.example.com; tokens 2+4+1
    assert got["example.com"] == (3, 7, 3, 2)
    assert got["co.uk"] == (1, 3, 1, 1)
    assert got[""] == (1, 2, 1, 5)
    assert got["localhost"] == (1, 1, 1, 6)


def test_domain_capped_deterministic_and_capped(spark):
    rows = [
        (i, f"https://h{i % 4}.dom{i % 2}.org/p/{i}", "t") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    capped = webtext.domain_capped(df, max_per_domain=5)
    counts = {
        r.domain: r.n
        for r in capped.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"dom0.org": 5, "dom1.org": 5}
    a = sorted((r.doc_id, r.domain) for r in capped.collect())
    b = sorted(
        (r.doc_id, r.domain)
        for r in webtext.domain_capped(
            df.repartition(7, "url"), max_per_domain=5
        ).collect()
    )
    assert a == b  # membership independent of partitioning


def test_cohort_retention_hand_computed(spark):
    """Users cohorted by first-seen day, counted once per (cohort,
    offset) regardless of how many events they fire that day."""
    day = 86_400
    rows = [
        # user 1: first seen day 0, returns day 0 (twice), day 2
        (1, 0 * day + 10), (1, 0 * day + 20), (1, 2 * day + 5),
        # user 2: first seen day 0 only
        (2, 0 * day + 30),
        # user 3: first seen day 1, returns day 2
        (3, 1 * day + 1), (3, 2 * day + 2),
    ]
    df = spark.createDataFrame(rows, "user_id long, sec long").select(
        "user_id", F.timestamp_seconds("sec").alias("ts")
    )
    got = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in webtext.cohort_retention(df).collect()
    }
    assert got == {
        (0, 0): 2,  # users 1, 2 on their first day
        (0, 2): 1,  # user 1 back two days later
        (1, 0): 1,  # user 3's cohort day
        (1, 1): 1,  # user 3 back next day
    }
