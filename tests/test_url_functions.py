"""functions/url.py: URL curation expressions (host, canonical form,
blocklists) — all JVM-side, verified on the corner cases crawl URLs
actually present."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_db_ingestor_spark.functions.url import (
    anti_join_blocklist,
    is_blocked_host,
    registrable_domain,
    url_host,
    url_normalize,
)


def _eval(spark, urls, col_fn):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.v for r in df.select(col_fn(F.col("url")).alias("v")).collect()]


def test_url_host_and_registrable_domain(spark):
    urls = [
        "https://WWW.Example.COM/path",
        "http://a.b.example.co/x?q=1",
        "https://localhost/x",
        "not a url",
    ]
    hosts = _eval(spark, urls, url_host)
    assert hosts[:3] == ["www.example.com", "a.b.example.co", "localhost"]
    df = spark.createDataFrame([(h,) for h in hosts[:3]], "h string")
    rdoms = [
        r.v for r in df.select(registrable_domain(F.col("h")).alias("v")).collect()
    ]
    assert rdoms == ["example.com", "example.co", ""]  # single label: no rdom


def test_url_normalize_strips_tracking_noise_only(spark):
    pairs = [
        # tracking params and fragment go; case of host goes
        (
            "https://Ex.COM/a/?utm_source=x&q=1&fbclid=z#frag",
            "https://ex.com/a?q=1",
        ),
        # param order and real params preserved
        ("https://ex.com/a?q=1&r=2", "https://ex.com/a?q=1&r=2"),
        # all-tracking query collapses, trailing slash stripped
        ("http://ex.com/b/?utm_medium=m", "http://ex.com/b"),
        ("http://ex.com/", "http://ex.com"),
    ]
    got = _eval(spark, [p[0] for p in pairs], url_normalize)
    assert got == [p[1] for p in pairs]


def test_blocklist_expression_and_anti_join(spark):
    urls = [
        "https://spam.example.com/a",  # subdomain of blocked
        "https://example.com/b",  # exactly blocked
        "https://notexample.com/c",  # suffix trap: NOT blocked
        "https://fine.org/d",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    flagged = [
        r.v
        for r in df.select(
            is_blocked_host(url_host(F.col("url")), ["Example.COM"]).alias("v")
        ).collect()
    ]
    assert flagged == [True, True, False, False]

    bl = spark.createDataFrame([("example.com",)], "domain string")
    kept = anti_join_blocklist(df, bl).collect()
    assert sorted(r.url for r in kept) == [
        "https://fine.org/d",
        "https://notexample.com/c",
    ]
    assert kept[0].asDict().keys() == {"url"}  # helper column dropped
    # plan: blocklist side broadcast, no shuffle of the corpus side
    plan = (
        anti_join_blocklist(df, bl)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.from_regex(r"[a-z][a-z0-9]{0,6}(\.[a-z][a-z0-9]{0,6}){1,3}", fullmatch=True),
        min_size=1,
        max_size=5,
        unique=True,
    )
)
def test_normalize_idempotent_on_generated_hosts(hosts):
    # property: normalize(normalize(u)) == normalize(u) — canonical
    # forms are fixed points.  (hypothesis can't take pytest fixtures;
    # get_spark's getOrCreate returns the suite's shared session)
    spark = _session()
    urls = [f"https://{h}/p/?utm_source=t&k=v" for h in hosts]
    once = _eval(spark, urls, url_normalize)
    twice = _eval(spark, once, url_normalize)
    assert once == twice


_SPARK = None


def _session():
    global _SPARK
    if _SPARK is None:
        from vector_db_ingestor_spark.session import get_spark

        _SPARK = get_spark("tests")
    return _SPARK
