"""URL / web curation operators (operators/web.py): component parsing,
canonicalization edge cases, registered-domain heuristic, domain census,
blocklist gate, and the map-only plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.web import (
    canonicalize_urls,
    domain_stats,
    filter_blocklist,
    parse_urls,
)


def _urls(spark, rows):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(rows)], "doc_id long, url string"
    )


def test_parse_components(spark):
    df = _urls(
        spark,
        [
            "https://user:pw@Host.Example.org:8443/a/b?x=1&y=2#frag",
            "http://plain.example.com",
            "ftp://files.example.com/pub/data.csv",
            "https://example.com/path#only-frag",
        ],
    )
    rows = {r["doc_id"]: r for r in parse_urls(df).collect()}
    r0 = rows[0]
    assert (r0["scheme"], r0["host"], r0["port"]) == ("https", "Host.Example.org", "8443")
    assert (r0["path"], r0["query"], r0["fragment"]) == ("/a/b", "x=1&y=2", "frag")
    r1 = rows[1]
    assert (r1["host"], r1["port"], r1["path"], r1["query"]) == (
        "plain.example.com", "", "", "",
    )
    assert rows[2]["scheme"] == "ftp" and rows[2]["path"] == "/pub/data.csv"
    # '#' before any '?' means no query — the fragment must not leak in
    assert rows[3]["query"] == "" and rows[3]["fragment"] == "only-frag"


def test_canonicalize_edge_cases(spark):
    df = _urls(
        spark,
        [
            # case + www + default port + tracking + unsorted params + fragment
            "HTTP://WWW.News.Example.COM:80/a?utm_campaign=x&b=2&a=1#top",
            # https default port; empty path -> '/'
            "https://Example.com:443?z=9",
            # non-default port survives; params all tracking -> no query part
            "https://api.example.com:8080/v1?utm_source=a&gclid=b",
            # co.uk second-level registry
            "https://shop.vendor.co.uk/item/7",
            # IPv4 host
            "http://192.168.0.7:9090/raw?b=1&a=2",
        ],
    )
    rows = {r["doc_id"]: r for r in canonicalize_urls(df).collect()}
    assert rows[0]["canonical_url"] == "http://news.example.com/a?a=1&b=2"
    assert rows[0]["registered_domain"] == "example.com"
    assert rows[0]["n_params_dropped"] == 1
    assert rows[1]["canonical_url"] == "https://example.com/?z=9"
    assert rows[2]["canonical_url"] == "https://api.example.com:8080/v1"
    assert rows[2]["n_params_dropped"] == 2
    assert rows[3]["registered_domain"] == "vendor.co.uk"
    assert rows[4]["registered_domain"] == "192.168.0.7"
    assert rows[4]["canonical_url"] == "http://192.168.0.7:9090/raw?a=2&b=1"


def test_canonical_equals_for_tracking_variants(spark):
    """Two fetches of one resource differing only in case/params/fragment
    must canonicalize identically — the property exact URL dedup relies on."""
    df = _urls(
        spark,
        [
            "https://www.Site.example.com/page?b=2&a=1",
            "HTTPS://site.EXAMPLE.com:443/page?a=1&utm_medium=email&b=2#sec",
        ],
    )
    c = canonicalize_urls(df).select("canonical_url").distinct().count()
    assert c == 1


def test_domain_stats_census(spark):
    df = spark.createDataFrame(
        [
            (0, "https://a.example.com/x", 10),
            (1, "https://b.example.com/y", 20),
            (2, "https://www.example.com/z", 30),
            (3, "http://other.net/q", 5),
        ],
        "doc_id long, url string, n_chars int",
    )
    rows = {r["registered_domain"]: r for r in domain_stats(df).collect()}
    assert rows["example.com"]["n_docs"] == 3
    assert rows["example.com"]["n_hosts"] == 3  # a., b., bare (www stripped)
    assert rows["example.com"]["n_chars"] == 60
    assert rows["other.net"]["n_docs"] == 1


def test_blocklist_gate(spark):
    df = _urls(
        spark,
        [
            "https://keep.example.com/a",
            "https://spam.example.net/b",
            "https://sub.spam.example.net/c",
            "https://fine.org/d",
        ],
    )
    kept = filter_blocklist(df, ["example.net"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 3]


def test_web_plans_are_map_only(spark):
    """parse/canonicalize are pure projections (no exchange, no UDF);
    domain_stats is one hash aggregate; the blocklist join broadcasts."""
    df = _urls(spark, ["https://a.example.com/x"]).withColumn(
        "n_chars", F.lit(1)
    )
    for frame in (parse_urls(df), canonicalize_urls(df)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    agg_plan = domain_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in agg_plan
    block_plan = (
        filter_blocklist(df, ["x.com"])._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in block_plan or "BroadcastExchange" in block_plan


def test_extract_links(spark):
    from datalake_indexes_spark.operators.web import (
        extract_links,
        link_domain_census,
    )

    docs = spark.createDataFrame(
        [
            (0, 'see <a class="x" href="https://www.a.example.com/p?q=1">A</a>'
                ' and <a href="http://b.other.co.uk:8080/q">B</a>'),
            (1, "no links here"),
            (2, '<a href="https://192.168.0.1/x">ip</a>'),
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["href"], r["link_domain"])
        for r in extract_links(docs).collect()
    )
    assert rows == [
        (0, "http://b.other.co.uk:8080/q", "other.co.uk"),
        (0, "https://www.a.example.com/p?q=1", "example.com"),
        (2, "https://192.168.0.1/x", "192.168.0.1"),
    ]
    census = {
        r["link_domain"]: (r["n_links"], r["n_docs"])
        for r in link_domain_census(docs).collect()
    }
    assert census["example.com"] == (1, 1)
