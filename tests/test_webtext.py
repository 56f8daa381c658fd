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
