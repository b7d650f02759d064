"""URL / web-provenance curation operators (extension surface — the
reference indexes lake tables and has no notion of document provenance;
web-crawl training corpora are keyed by URL, and dedup / filtering /
mixing all start from a canonical URL and its registered domain).

Every operator is a pure native-expression projection or hash aggregate
(Java-regex ∩ RE2 dialect, shared verbatim with the DuckDB oracle twins)
— zero UDFs, zero shuffles except ``domain_stats``'s single aggregate,
so at 100 TB URL curation rides along whatever scan the pipeline already
performs.

Scope notes (documented, not silent): IPv6 bracket hosts and userinfo
percent-decoding are out of scope; the registered-domain extraction is
the two-label heuristic widened to three labels for the common
``co.uk``-style second-level registries rather than the full public
suffix list (which is a data file, not logic — slot it in as a broadcast
join against a suffix table when available).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tracking parameters stripped by canonicalization (matched against the
# full `key=value` pair; bare keys without '=' are matched too).
TRACKING_PARAM_REGEX = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)(=.*)?$"

# Second-level registry labels that make a three-label registered domain
# (host `a.b.co.uk` → `b.co.uk`).  Heuristic subset of the public suffix
# list; see module docstring.
SECOND_LEVEL_LABELS = ("co", "com", "net", "org", "gov", "ac", "edu")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^#?]*\?([^#]*)"
_FRAGMENT_RE = r"#(.*)$"
_HOST_RE = r"^(?:[^@]*@)?([^:]*)"
_PORT_RE = r":([0-9]+)$"
_IPV4_RE = r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$"


def _registered_domain(host_l: F.Column) -> F.Column:
    """Registered domain of an already-lowercased host column."""
    labels = F.split(host_l, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    sl = F.array(*[F.lit(x) for x in SECOND_LEVEL_LABELS])
    return (
        F.when(host_l.rlike(_IPV4_RE), host_l)
        .when((n >= 3) & F.array_contains(sl, second), F.concat_ws(".", F.slice(labels, n - 2, 3)))
        .when(n >= 2, F.concat_ws(".", F.slice(labels, n - 1, 2)))
        .otherwise(host_l)
    )


def parse_urls(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, scheme, host, port, path, query, fragment) — RFC-3986-ish
    component split via anchored regex extraction.  Unmatched components
    come back as '' (both engines agree on empty-group semantics), port
    as NULL-free string for cross-engine hash stability.
    """
    u = F.col(url_col)
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_extract(u, _SCHEME_RE, 1).alias("scheme"),
        F.regexp_extract(auth, _HOST_RE, 1).alias("host"),
        F.regexp_extract(auth, _PORT_RE, 1).alias("port"),
        F.regexp_extract(u, _PATH_RE, 1).alias("path"),
        F.regexp_extract(u, _QUERY_RE, 1).alias("query"),
        F.regexp_extract(u, _FRAGMENT_RE, 1).alias("fragment"),
    )


def _host_col(url):
    """Normalized host of a URL column: authority -> host -> lowercase,
    leading ``www.`` stripped.  The ONE host-normalization rule shared by
    canonicalize_urls / domain_stats / extract_links — a future change
    (``www2.``, trailing dots, public-suffix upgrade) lands everywhere at
    once instead of silently diverging between the census and the
    canonical key.  (The DuckDB twins mirror this chain in SQL.)"""
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    return F.regexp_replace(
        F.lower(F.regexp_extract(auth, _HOST_RE, 1)), r"^www\.", ""
    )


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, canonical_url, registered_domain, host, n_params_dropped)
    — the dedup/join key for web-crawl corpora.

    Canonical form: lowercased scheme + host, leading ``www.`` stripped,
    default ports (http:80 / https:443) dropped, empty path → ``/``,
    query parameters with tracking keys removed and the survivors sorted
    (param order never distinguishes two fetches of the same resource),
    fragment dropped (client-side only).  Map-side projection — no
    shuffle, no UDF; at lake scale this is a free rider on the document
    scan feeding exact dedup (`dedup.exact_dedup` on ``canonical_url``).
    """
    u = F.col(url_col)
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    scheme_l = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host_l = _host_col(u)
    port = F.regexp_extract(auth, _PORT_RE, 1)
    path = F.regexp_extract(u, _PATH_RE, 1)
    query = F.regexp_extract(u, _QUERY_RE, 1)

    port_part = F.when(
        (port == "")
        | ((scheme_l == "http") & (port == "80"))
        | ((scheme_l == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path_c = F.when(path == "", F.lit("/")).otherwise(path)

    params = F.filter(F.split(query, "&"), lambda p: p != "")
    kept = F.filter(params, lambda p: ~p.rlike(TRACKING_PARAM_REGEX))
    q_c = F.array_join(F.array_sort(kept), "&")
    query_part = F.when(q_c == "", F.lit("")).otherwise(F.concat(F.lit("?"), q_c))

    return df.select(
        F.col(id_col).alias("doc_id"),
        F.concat(scheme_l, F.lit("://"), host_l, port_part, path_c, query_part).alias(
            "canonical_url"
        ),
        _registered_domain(host_l).alias("registered_domain"),
        host_l.alias("host"),
        (F.size(params) - F.size(kept)).cast("long").alias("n_params_dropped"),
    )


def domain_stats(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id", chars_col: str = "n_chars"
) -> DataFrame:
    """(registered_domain, n_docs, n_hosts, n_chars) — the per-domain
    corpus census that domain-level mixing weights, crawl-politeness
    audits and blocklist candidates are derived from.  One hash aggregate
    with map-side combine; output is bounded by domain cardinality.
    """
    host_l = _host_col(F.col(url_col))
    canon = df.select(
        _registered_domain(host_l).alias("registered_domain"),
        host_l.alias("host"),
        F.col(chars_col),
    )
    return (
        canon.groupBy("registered_domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("host").alias("n_hosts"),
            F.sum(chars_col).cast("long").alias("n_chars"),
        )
    )


def filter_blocklist(
    df: DataFrame,
    blocked_domains: DataFrame | list[str],
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, registered_domain) for documents SURVIVING the domain
    blocklist — the standard crawl-hygiene gate (spam / adult / SEO-farm
    domain lists run 10⁵-10⁶ rows: always broadcast-sized next to the
    corpus, hence the explicit broadcast anti-join).
    """
    canon = canonicalize_urls(df, url_col, id_col)
    if isinstance(blocked_domains, list):
        spark = df.sparkSession
        blocked = spark.createDataFrame(
            [(d,) for d in blocked_domains], "registered_domain string"
        )
    else:
        blocked = blocked_domains
    return canon.select("doc_id", "registered_domain").join(
        F.broadcast(blocked.select("registered_domain")),
        "registered_domain",
        "left_anti",
    ).select("doc_id", "registered_domain")


_HREF_RE = r'<a[^>]*href="([^"]*)"'


def extract_links(
    df: DataFrame, html_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, href, link_domain) — one row per ``<a href="...">`` anchor,
    with the target's registered domain; the crawl-frontier / link-graph
    extraction step.  Map-side regex walk + explode (no UDF, no shuffle);
    the per-row output is bounded by anchor count, so at lake scale this
    is a flatMap rider on the document scan.

    Scope: double-quoted hrefs only (the regex dialect shared with the
    oracle has no backreferences, so a single generic quote-matching
    pattern is out; extend with a second pass for single-quoted anchors
    if a corpus needs it)."""
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(_HREF_RE), 1)
    exploded = df.select(
        F.col(id_col).alias("doc_id"), F.explode(hrefs).alias("href")
    )
    host_l = _host_col(F.col("href"))
    return exploded.select(
        "doc_id", "href", _registered_domain(host_l).alias("link_domain")
    )


def link_domain_census(
    df: DataFrame, html_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(link_domain, n_links, n_docs) — aggregate out-link census over the
    corpus (which domains the corpus points at, and from how many
    documents).  One hash aggregate over the exploded anchors."""
    return (
        extract_links(df, html_col, id_col)
        .groupBy("link_domain")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )


def domain_quota_cap(
    df: DataFrame,
    cap: int = 10,
    url_col: str = "url",
    id_col: str = "doc_id",
    priority_col: str | None = None,
) -> DataFrame:
    """(doc_id, registered_domain, domain_rank) — per-domain quota
    capping: keep at most ``cap`` documents per registered domain, the
    standard over-represented-site control in crawl curation (a handful
    of mega-domains otherwise dominate the corpus mix).

    Selection is deterministic: by descending ``priority_col`` when
    given (keep the best copies), else by an md5 shuffle of the doc id
    (a fair fixed-seed random draw — no engine-dependent rand()).  Ties
    break on doc_id.

    Scale shape: one window ranked within each registered domain — the
    shuffle key is the domain, so parallelism is domain cardinality
    (millions for a web corpus) and the only skewed partition is the
    hottest domain; the window computes rank in one pass per partition
    (no per-domain collect, no global sort).  AQE skew-split applies to
    the exchange like any other keyed shuffle.
    """
    from pyspark.sql.window import Window

    canon = canonicalize_urls(df, url_col, id_col).select(
        "doc_id", "registered_domain"
    )
    if priority_col is not None:
        ranked_src = canon.join(
            df.select(F.col(id_col).alias("doc_id"), priority_col), "doc_id"
        )
        order = [F.desc(priority_col), F.asc("doc_id")]
    else:
        ranked_src = canon.withColumn(
            "__draw", F.md5(F.col("doc_id").cast("string"))
        )
        order = [F.asc("__draw"), F.asc("doc_id")]
    w = Window.partitionBy("registered_domain").orderBy(*order)
    return (
        ranked_src.withColumn("domain_rank", F.row_number().over(w))
        .filter(F.col("domain_rank") <= cap)
        .select("doc_id", "registered_domain", "domain_rank")
    )
