"""URL canonicalization + domain analytics — the web-corpus curation
front door (every C4/RefinedWeb-style pipeline dedups and filters by
canonical URL and registered domain before touching document text).

All pure column expressions (codegen, zero shuffle, zero UDFs):
regexp parsing for the URL grammar, array ops for query-parameter
hygiene. Engine-portable — the oracle SQL mirrors each step with
DuckDB's regexp/list functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tracking parameters stripped during normalization (the de-facto
# standard list: Google/Facebook/Mailchimp click ids + utm_* campaign
# tags). Matching is on the parameter NAME before '='.
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|ref)=.*$"

# Country-code second-level registries where the registered domain is
# the last THREE labels (heuristic public-suffix subset — the full
# PSL is a data file; this covers the common cases and the rule is
# the operator, the list is configuration).
CC_SLD = ["co.uk", "ac.uk", "gov.uk", "com.au", "co.jp", "co.in", "com.br", "co.nz"]


def normalize_url(url: Column | str) -> Column:
    """Canonical form: lowercase scheme+host, default port stripped
    (:80 for http, :443 for https), fragment dropped, tracking
    parameters removed, remaining query parameters SORTED (byte
    order), empty path → '/'. Two URLs naming the same resource
    normalize to the same string — the URL-dedup key."""
    u = F.regexp_replace(F.trim(url if isinstance(url, Column) else F.col(url)), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[^:]+://([^/?#]*)", 1))
    host = (
        F.when((scheme == "http"), F.regexp_replace(hostport, ":80$", ""))
        .when((scheme == "https"), F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    rest = F.regexp_extract(u, r"^[^:]+://[^/?#]*(.*)$", 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    params = F.array_sort(params)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(
            F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
        ).otherwise(F.lit("")),
    )


def url_host(url: Column | str) -> Column:
    """Lowercased host without port."""
    u = url if isinstance(url, Column) else F.col(url)
    return F.regexp_replace(
        F.lower(F.regexp_extract(u, r"^[^:]+://([^/?#]*)", 1)), r":[0-9]+$", ""
    )


def registered_domain(host: Column | str) -> Column:
    """The registrable domain: last two host labels, or last THREE
    when the final two form a known country-code second-level suffix
    (co.uk and friends — the public-suffix heuristic)."""
    h = host if isinstance(host, Column) else F.col(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    # try_element_at, not element_at: ANSI mode evaluates BOTH when()
    # branches' expressions, so a single-label host ("localhost")
    # aborts on index -2 even inside the guarded branch
    l1, l2, l3 = (F.try_element_at(labels, F.lit(i)) for i in (-1, -2, -3))
    last2 = F.concat_ws(".", l2, l1)
    cc = F.array(*[F.lit(s) for s in CC_SLD])
    take3 = F.array_contains(cc, last2) & (n >= 3)
    return F.when(take3, F.concat_ws(".", l3, l2, l1)).otherwise(
        F.when(n >= 2, last2).otherwise(h)
    )


def canonical_url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Group documents by canonical URL: (canonical_url, n_docs,
    first_doc_id) — the keep-first URL-level dedup decision (the
    cheapest dedup pass in a web pipeline, run before any content
    hashing). One groupBy on the normalized key."""
    return (
        df.select(F.col(id_col).alias("doc_id"), normalize_url(url_col).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc_id"))
    )


def domain_document_stats(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per registered domain: document count + distinct hosts — the
    input to domain-level quality decisions (blocklists, per-domain
    caps, crawl-bias weighting). One groupBy on the derived domain."""
    host = url_host(url_col)
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            host.alias("host"),
            registered_domain(host).alias("domain"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
        )
    )


def filter_blocked_domains(
    df: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop documents whose registered domain appears in ``blocklist``
    (column ``domain``) — broadcast anti-join; the blocklist is dim-
    sized by construction."""
    tagged = df.withColumn("__domain", registered_domain(url_host(url_col)))
    return tagged.join(
        F.broadcast(blocklist.select(F.col("domain").alias("__domain"))),
        "__domain",
        "left_anti",
    ).drop("__domain")


HREF_RE = r"""href\s*=\s*["']([^"'<>]+)["']"""


def extract_links(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, href): every href attribute value in the document's
    HTML, exploded — the link-graph extraction step between crawling
    and ranking (feed hrefs through ``normalize_url`` /
    ``registered_domain`` for the host graph, then the graph
    operators: PageRank over domains is exactly
    ``pagerank_fixed(domain_edges)``). Pure regexp explode, zero
    shuffle; relative links pass through verbatim (resolution against
    a base URL is string concat the caller owns)."""
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), 1)
        ).alias("href"),
    )
    return d.where(F.col("href") != "")


def url_path_rollup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Hierarchical rollup of URL path prefixes: every page count
    aggregated into each ancestor directory — the site-structure view
    ('/docs/ has 40k pages, /docs/api/ has 12k') a crawl audit reads
    before deciding what to keep. Pure codegen: extract host + path,
    split segments, explode the PREFIX list (depth ≤ path depth — a
    bounded fan-out, not a join), one (host, prefix) aggregation.

    Returns (host, path_prefix, depth, n_pages, n_leaf_pages) where
    n_leaf_pages counts pages terminating exactly at the prefix.
    """
    host = url_host(F.col(url_col))
    path = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    base = df.select(
        host.alias("host"),
        segs.alias("segs"),
        F.size(F.filter(F.split(path, "/"), lambda s: s != "")).alias("n_segs"),
    )
    # prefixes: depth 1..len(segs); slice is 1-indexed
    prefixes = base.select(
        "host",
        "n_segs",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("segs")),
                lambda d: F.struct(
                    d.alias("depth"),
                    F.concat(
                        F.lit("/"),
                        F.array_join(F.slice("segs", 1, d), "/"),
                        F.lit("/"),
                    ).alias("prefix"),
                ),
            )
        ).alias("p"),
    ).filter(F.col("n_segs") > 0)
    return (
        prefixes.select(
            "host",
            F.col("p.prefix").alias("path_prefix"),
            F.col("p.depth").cast("int").alias("depth"),
            (F.col("p.depth") == F.col("n_segs")).cast("int").alias("is_leaf"),
        )
        .groupBy("host", "path_prefix", "depth")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pages"),
            F.sum("is_leaf").cast("bigint").alias("n_leaf_pages"),
        )
    )
