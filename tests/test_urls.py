"""URL canonicalization + domain analytics (text/urls.py)."""

from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.text.urls import (
    canonical_url_dedup,
    domain_document_stats,
    filter_blocked_domains,
    normalize_url,
    registered_domain,
    url_host,
)


def _norm(spark, url):
    return (
        spark.range(1)
        .select(normalize_url(F.lit(url)).alias("u"))
        .collect()[0]["u"]
    )


def test_normalize_case_port_fragment_tracking_and_sort(spark):
    got = _norm(
        spark,
        "HTTPS://WWW.Example.COM:443/Path/Page?utm_source=x&b=2&a=1&gclid=zz#frag",
    )
    assert got == "https://www.example.com/Path/Page?a=1&b=2"


def test_normalize_http_default_port_and_empty_path(spark):
    assert _norm(spark, "http://Host.Org:80") == "http://host.org/"
    # non-default port survives
    assert _norm(spark, "http://host.org:8080/a") == "http://host.org:8080/a"
    # https keeps :80 (not its default)
    assert _norm(spark, "https://host.org:80/a") == "https://host.org:80/a"


def test_normalize_no_query_no_trailing_question_mark(spark):
    assert _norm(spark, "https://h.io/p?utm_campaign=only") == "https://h.io/p"
    assert _norm(spark, "https://h.io/p") == "https://h.io/p"


def test_path_case_preserved_host_case_folded(spark):
    assert _norm(spark, "https://HOST.io/CaseSensitive") == "https://host.io/CaseSensitive"


def test_registered_domain_rules(spark):
    rows = (
        spark.createDataFrame(
            [("news.bbc.co.uk",), ("www.sub.deep.example.com",), ("example.com",), ("localhost",)],
            "h string",
        )
        .select(F.col("h"), registered_domain(F.col("h")).alias("d"))
        .collect()
    )
    got = {r.h: r.d for r in rows}
    assert got["news.bbc.co.uk"] == "bbc.co.uk"
    assert got["www.sub.deep.example.com"] == "example.com"
    assert got["example.com"] == "example.com"
    assert got["localhost"] == "localhost"


def test_canonical_dedup_groups_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.com/x?b=2&a=1"),
            (2, "HTTPS://A.COM:443/x?a=1&b=2&utm_source=z#f"),
            (3, "https://a.com/y"),
        ],
        "doc_id long, url string",
    )
    out = {r.canonical_url: (r.n_docs, r.first_doc_id) for r in canonical_url_dedup(df).collect()}
    assert out["https://a.com/x?a=1&b=2"] == (2, 1)
    assert out["https://a.com/y"] == (1, 3)


def test_domain_stats_and_blocklist(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.spam.com/a"),
            (2, "https://cdn.spam.com/b"),
            (3, "https://good.org/c"),
        ],
        "doc_id long, url string",
    )
    stats = {r.domain: (r.n_docs, r.n_hosts) for r in domain_document_stats(df).collect()}
    assert stats["spam.com"] == (2, 2)
    assert stats["good.org"] == (1, 1)

    block = spark.createDataFrame([("spam.com",)], "domain string")
    kept = [r.doc_id for r in filter_blocked_domains(df, block).collect()]
    assert kept == [3]


def test_url_host_strips_any_port(spark):
    got = (
        spark.range(1)
        .select(url_host(F.lit("https://X.Y.Z:9443/p?q=1")).alias("h"))
        .collect()[0]["h"]
    )
    assert got == "x.y.z"


def test_extract_links_both_quote_styles_and_relative(spark):
    from dpe_energy_performance_analysis_etl_spark.text.urls import extract_links

    df = spark.createDataFrame(
        [
            (1, '<a href="https://a.com/x">x</a> <a href=\'http://b.org\'>y</a>'
                ' <a href="/rel">r</a> <a href = "https://c.net">spaced</a>'),
            (2, "no links at all"),
        ],
        "doc_id long, html string",
    )
    got = {(r.doc_id, r.href) for r in extract_links(df).collect()}
    assert got == {
        (1, "https://a.com/x"),
        (1, "http://b.org"),
        (1, "/rel"),
        (1, "https://c.net"),
    }
