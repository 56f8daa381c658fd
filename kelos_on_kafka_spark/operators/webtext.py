"""Web-corpus URL/domain operators — host extraction, registered-domain
rollup, per-domain corpus stats.

A Common-Crawl-scale pipeline is dominated by per-domain decisions
(domain-level quality priors, per-domain page caps, spam-domain
blocklists), so domain extraction must be a pure Catalyst expression:
the regexes below use the portable subset (no lookaround, no
backreferences) so Java regex and RE2/DuckDB agree byte-for-byte, and
every downstream aggregate is integer-exact.

Reference surface: the reference has no URL handling (points are
numeric CSV, InputProducer.java:40-68); this is part of the web-text
generalization the engine targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kelos_on_kafka_spark.operators.textstats import n_tokens
from kelos_on_kafka_spark.plans.layout import fan_out

# scheme://host[:port]/... -> host (group 1); empty string when the
# value does not parse as an absolute URL
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"
# last two dot-labels ("news.bbc.co.uk" -> "co.uk" — a public-suffix
# list refines this in deployment; the operator contract is the regex)
_REG_DOMAIN_RE = r"[^.]+\.[^.]+$"


def url_host(url_col: str = "url") -> Column:
    """Lower-cased host of an absolute URL ('' when unparseable)."""
    return F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))


def registered_domain(host: Column) -> Column:
    """Last-two-labels registered domain of a host column; hosts with
    fewer than two labels map to themselves."""
    tail = F.regexp_extract(host, _REG_DOMAIN_RE, 0)
    return F.when(tail == "", host).otherwise(tail)


# tracking query params dropped by canonical_url: utm_* and the usual
# click-id keys; anchored, portable regex (works byte-identically in
# Java regex and DuckDB RE2 — no lookaround)
_TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$"


def canonical_url(url_col: str = "url") -> Column:
    """Canonical form of an absolute URL — the normalization a crawl
    dedup keys on so `HTTP://Host/a/?utm_source=x&b=2&a=1#top` and
    `http://host/a?a=1&b=2` collapse to one key:

    1. scheme and authority lower-cased (path/query case preserved —
       paths are case-significant on most origins),
    2. fragment stripped,
    3. default port stripped (http:80 / https:443),
    4. tracking params dropped (``utm_*``, fbclid, gclid, ref),
    5. surviving query params sorted bytewise,
    6. trailing slash(es) stripped from the path.

    Pure Catalyst expression (regexp + split/filter/array_sort/
    concat_ws — whole-stage codegen, no UDF); the same rules are
    expressible verbatim in DuckDB SQL, so the op is oracle-checkable.
    Unparseable values (no ``scheme://``) return '' — callers route
    them to a quarantine bucket rather than silently keying on junk."""
    u = F.regexp_replace(F.col(url_col), r"#.*$", "")  # 2: fragment
    scheme = F.lower(
        F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    )
    auth = F.lower(
        F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    )
    auth = F.when(
        scheme == "http", F.regexp_replace(auth, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(auth, r":443$", "")
    ).otherwise(auth)
    path = F.regexp_replace(
        F.regexp_extract(
            u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1
        ),
        r"/+$",
        "",
    )
    qraw = F.regexp_extract(u, r"\?([^#]*)", 1)
    qkeep = F.array_sort(
        F.filter(
            F.split(qraw, "&"),
            lambda x: (x != "") & ~x.rlike(_TRACKING_PARAM_RE),
        )
    )
    qstr = F.concat_ws("&", qkeep)
    return F.when(scheme == "", F.lit("")).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            auth,
            path,
            F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(
                F.lit("")
            ),
        )
    )


def canonical_url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Group pages by canonical URL: one row per canonical key with the
    variant count and the keeper (min id) — the URL-level dedup pass a
    crawl pipeline runs BEFORE content dedup (it is free: no text is
    read, the shuffle key is one short string).  Unparseable URLs
    ('' canonical) group together for quarantine accounting."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            canonical_url(url_col).alias("canon_url"),
        )
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keeper_id"),
        )
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-registered-domain corpus stats: page count, token total,
    distinct hosts — the table per-domain caps, priors and blocklists
    join against.  One hash aggregation on the domain key; map-side
    partial aggregation absorbs hot domains (counts/sums are
    combinable), so no explicit salting is needed here."""
    dom = registered_domain(url_host(url_col))
    return (
        df.select(
            dom.alias("domain"),
            url_host(url_col).alias("host"),
            F.col(id_col).alias("doc_id"),
            n_tokens(text_col).alias("nt"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
            F.countDistinct("host").alias("n_hosts"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


def domain_capped(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_per_domain: int = 100,
    seed: int = 0,
) -> DataFrame:
    """'At most N pages per registered domain', chosen by portable hash
    order (deterministic, engine-portable, unbiased) — the standard
    web-corpus balance step.  Thin wrapper: derives the domain column
    then applies ``sampling.stratified_cap`` (per-key window top-n; for
    pathological mega-domains route through ``plans.skew.salted_topn``
    with the same (hash, id) order)."""
    from kelos_on_kafka_spark.operators.sampling import stratified_cap

    with_dom = df.withColumn(
        "domain", registered_domain(url_host(url_col))
    )
    return stratified_cap(with_dom, ["domain"], id_col, max_per_domain, seed)


def bounce_rate(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Daily engagement metrics over sessionized traffic: sessions are
    per-user strict-> gap islands (the session_window-aligned
    convention, see operators.windowing.assign_session_ids), a bounce
    is a single-event session, and each session counts toward the UTC
    day its FIRST event lands in.  Returns (day_id, n_sessions,
    n_bounces, bounce_pct) — bounce_pct is the one double column, a
    single division of two exact counts (IEEE-deterministic, oracle-
    safe).

    Scale shape: one shuffle on user_id for the island pass, one
    map-side-combinable aggregation per (user, session), one final
    small aggregation on day_id — the same two-exchange plan
    sessionization itself needs; no window over the hot day key."""
    from pyspark.sql.window import Window

    from kelos_on_kafka_spark.operators.windowing import epoch_us

    gap_us = gap_seconds * 1_000_000
    w = Window.partitionBy(user_col).orderBy(
        F.col("__ts_us").asc(), F.col(id_col).asc()
    )
    base = events.select(
        F.col(user_col), F.col(id_col), epoch_us(ts_col).alias("__ts_us")
    )
    flagged = base.withColumn(
        "__new",
        F.when(
            F.lag("__ts_us").over(w).isNull()
            | (F.col("__ts_us") - F.lag("__ts_us").over(w) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__sid",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sessions = flagged.groupBy(user_col, "__sid").agg(
        F.min("__ts_us").alias("__start_us"),
        F.count(F.lit(1)).alias("__n_events"),
    )
    return (
        sessions.groupBy(
            F.expr("__start_us div 86400000000").alias("day_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.when(F.col("__n_events") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_bounces"),
        )
        .withColumn(
            "bounce_pct",
            F.col("n_bounces").cast("double")
            / F.col("n_sessions").cast("double"),
        )
    )


# href="..." attribute values; portable regex subset (no lookaround)
_HREF_RE = r'href="([^"]*)"'


def extract_links(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Explode every ``href="..."`` attribute of an HTML column into
    (id, pos, link) rows — the link-graph edge extraction of a
    Common-Crawl pipeline (the input_hint's html column made useful:
    outlink tables, anchor-spam stats, crawl frontiers).

    Pure Catalyst: regexp_extract_all + posexplode_outer, so a page
    with no links still yields one row with NULL link (lossless —
    downstream anti-joins can tell "no links" from "dropped page").
    Scale shape: the html bytes stay in the scan stage's task — only
    (id, pos, link) triples leave it; wrap compute-heavy callers in
    fan_out upstream (small scans arrive as one partition)."""
    links = F.regexp_extract_all(
        F.coalesce(F.col(html_col), F.lit("")), F.lit(_HREF_RE), F.lit(1)
    )
    return fan_out(df).select(
        F.col(id_col),
        F.posexplode_outer(links).alias("pos", "link"),
    )


def link_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    text_col: str = "text",
) -> DataFrame:
    """Per-page outlink statistics: (id, n_links, n_hosts,
    link_density) where link_density = links per whitespace token of
    the extracted text — one of the north-star per-page feature-vector
    components (link density) as a first-class relational operator.

    Everything happens INSIDE one projection over the scan — the href
    array, its distinct host projection and the token count never
    leave the task as anything bigger than three numbers per page, so
    at 10^12 pages this is a pure map stage (no shuffle at all).
    NULL html counts as zero links; link_density is NULL when the
    text has no tokens (never a division by zero)."""
    links = F.regexp_extract_all(
        F.coalesce(F.col(html_col), F.lit("")), F.lit(_HREF_RE), F.lit(1)
    )
    hosts = F.array_distinct(
        F.transform(links, lambda u: F.regexp_extract(u, _HOST_RE, 1))
    )
    ntok = n_tokens(text_col)
    return fan_out(df).select(
        F.col(id_col),
        F.size(links).cast("long").alias("n_links"),
        F.size(hosts).cast("long").alias("n_hosts"),
        F.when(
            ntok > 0,
            F.size(links).cast("double") / ntok.cast("double"),
        ).alias("link_density"),
    )


def cohort_retention(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Classic COHORT RETENTION matrix: users bucketed by first-seen
    day (cohort), counted on each later day they return —
    (cohort_day, day_offset, n_users), integer-exact end to end.

    Scale shape: one distinct over (user, day) pairs (two integers —
    map-side combined), one min-agg per user, one join back on the
    user key, one final rollup.  No window functions, no text, no
    floats; at 10^12 events the (user, day) projection is the only
    thing that ever shuffles."""
    d = df.select(
        F.col(key_col),
        # integer floor division (ADVICE r6): long/long is DOUBLE
        # division in Spark and only truncates exactly while
        # epoch_us < 2^53; `div` matches the oracle's // and the
        # repo's integer-exact convention at any epoch
        F.expr(
            "timestampdiff(MICROSECOND, "
            "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), "
            f"CAST({ts_col} AS TIMESTAMP_NTZ)) div {bucket_us}"
        ).alias("day_id"),
    ).distinct()
    first = d.groupBy(key_col).agg(F.min("day_id").alias("cohort_day"))
    return (
        d.join(first, key_col)
        .groupBy(
            "cohort_day",
            (F.col("day_id") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
