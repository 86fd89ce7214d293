"""URL canonicalization — merge-key hygiene cases.

Every case is (input, expected canonical); the suite also pins the two
invariants the merge depends on: idempotence (canon(canon(x)) ==
canon(x)) and non-URL passthrough (garbage never collides).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_exchange_etl_spark.functions.urls import (
    canonicalize_url,
    url_host,
    url_path,
    url_query,
    url_registered_domain,
    url_scheme,
)

CASES = [
    # scheme/host case + default port + www
    ("HTTP://WWW.Example.COM:80/a", "http://example.com/a"),
    ("https://Example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    # fragment dropped
    ("http://example.com/a#section-2", "http://example.com/a"),
    # trailing slash off non-root; root kept; empty path -> /
    ("http://example.com/a/", "http://example.com/a"),
    ("http://example.com/", "http://example.com/"),
    ("http://example.com", "http://example.com/"),
    # tracking params dropped (case-insensitive name match), rest sorted
    (
        "http://example.com/a?utm_source=tw&b=2&A=1&gclid=xyz",
        "http://example.com/a?A=1&b=2",
    ),
    ("http://example.com/a?utm_source=tw", "http://example.com/a"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    # userinfo dropped
    ("http://user:pw@example.com/a", "http://example.com/a"),
    # non-URL passthrough
    ("not a url", "not a url"),
    ("", ""),
]


def _canon(spark, values, **kw):
    df = spark.createDataFrame([(v,) for v in values], "url string")
    return [
        r.c for r in df.select(canonicalize_url(F.col("url"), **kw).alias("c")).collect()
    ]


def test_canonicalize_cases(spark):
    got = _canon(spark, [i for i, _ in CASES])
    for (inp, want), g in zip(CASES, got):
        assert g == want, f"{inp!r}: got {g!r}, want {want!r}"


def test_canonicalize_idempotent(spark):
    once = _canon(spark, [i for i, _ in CASES])
    twice = _canon(spark, once)
    assert once == twice


def test_keep_www_option(spark):
    got = _canon(spark, ["http://www.example.com/a"], strip_www=False)
    assert got == ["http://www.example.com/a"]


def test_component_extractors(spark):
    df = spark.createDataFrame(
        [("HTTPS://user@News.BBC.co.uk:8443/p/q/?x=1&y=2#frag",)], "url string"
    )
    r = df.select(
        url_scheme(F.col("url")).alias("s"),
        url_host(F.col("url")).alias("h"),
        url_registered_domain(F.col("url")).alias("d"),
        url_path(F.col("url")).alias("p"),
        url_query(F.col("url")).alias("q"),
    ).first()
    assert r.s == "https"
    assert r.h == "news.bbc.co.uk"
    assert r.d == "co.uk"  # documented two-label stand-in (no PSL offline)
    assert r.p == "/p/q/"
    assert r.q == "x=1&y=2"


def test_canonical_key_merges_spellings(spark):
    """The motivating property: several spellings of one page map to one
    merge key, distinct pages stay distinct."""
    same = [
        "HTTP://WWW.Example.com:80/news/today/?utm_source=x#top",
        "http://example.com/news/today?utm_source=y",
        "http://example.com/news/today/",
    ]
    other = ["http://example.com/news/yesterday", "https://example.com/news/today"]
    got = set(_canon(spark, same + other))
    assert len(got) == 3
    assert set(_canon(spark, same)) == {"http://example.com/news/today"}


def test_plan_stays_jvm_side(spark):
    """No Python evaluation nodes: the canonicalizer must be usable in
    front of the merge's narrow aggregation at scan speed."""
    df = spark.createDataFrame([("http://a.b/c",)], "url string")
    plan = (
        df.select(canonicalize_url(F.col("url")).alias("u"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_pipeline_canonicalize_keys(spark, tmpdir_path):
    """Opt-in key canonicalization collapses spelling variants onto one
    LWW key at merge time (off by default: key identity is a
    table-birth decision)."""
    import datetime as dt
    import os

    from crypto_exchange_etl_spark.model import CHANGES_SCHEMA
    from crypto_exchange_etl_spark.streaming.pipeline import CdcPipeline

    ts = dt.datetime(2026, 1, 1)
    rows = [
        (0, 0, "U", "HTTP://WWW.Example.com:80/a?utm_source=x", ts, b"<p>v0</p>", "en"),
        (1, 0, "U", "http://example.com/a/", ts, b"<p>v1</p>", "en"),
        (2, 0, "U", "http://example.com/b", ts, b"<p>b</p>", "en"),
    ]
    df = spark.createDataFrame(rows, CHANGES_SCHEMA)
    pipe = CdcPipeline(
        spark, os.path.join(tmpdir_path, "t"), n_buckets=4, canonicalize_keys=True
    )
    pipe.apply_batch(df, batch_id=0)
    got = {
        (r.url, r.lsn)
        for r in pipe.table.read_physical()
        .where(~F.col("is_deleted"))
        .select("url", "lsn")
        .collect()
    }
    # the two /a spellings collapsed; lsn=1 won LWW at equal warc_ts
    assert got == {("http://example.com/a", 1), ("http://example.com/b", 2)}


def test_canonicalize_fuzz_idempotent(spark):
    """500 grammar-generated URLs (every combination of case, ports,
    userinfo, www, paths, params, fragments, plus junk): canonicalization
    is idempotent across the board — one Spark pass for the whole corpus."""
    import random

    rng = random.Random(1234)
    schemes = ["http", "HTTP", "https", "HTTPS"]
    hosts = ["Example.com", "www.example.com", "a.b.co.uk", "X.Y", "localhost"]
    ports = ["", ":80", ":443", ":8080"]
    users = ["", "u@", "u:p@"]
    paths = ["", "/", "/a", "/a/", "/a/b/c", "/a%20b/"]
    queries = ["", "?a=1", "?b=2&a=1", "?utm_source=x", "?a=1&utm_medium=y&z",
               "?=v", "?a"]
    frags = ["", "#f", "#a/b?c"]
    urls = []
    for _ in range(500):
        urls.append(
            rng.choice(schemes) + "://" + rng.choice(users) + rng.choice(hosts)
            + rng.choice(ports) + rng.choice(paths) + rng.choice(queries)
            + rng.choice(frags)
        )
    urls += ["", "no scheme here", "ftp://weird.host:21/x?b=1&a=2#z"]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice
