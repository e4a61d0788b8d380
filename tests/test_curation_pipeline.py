"""End-to-end curation funnel (pipelines/curation.py)."""

from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.pipelines.curation import curation_funnel


def _docs(spark):
    rows = [
        # two URL variants of the same page (utm / case) -> one survives
        (1, "alpha beta " + " ".join(f"w{i}" for i in range(30)), "https://a.com/x?b=2&a=1"),
        (2, "alpha beta " + " ".join(f"w{i}" for i in range(30)), "HTTPS://A.COM:443/x?a=1&b=2&utm_source=z"),
        # distinct URL, identical CONTENT as doc 1 -> exact dedup kills it
        (3, "alpha beta " + " ".join(f"w{i}" for i in range(30)), "https://a.com/y"),
        # unique but too short -> quality gate
        (4, "tiny doc", "https://b.com/1"),
        # unique, long enough
        (5, " ".join(f"u{i} filler" for i in range(40)), "https://b.com/2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, url string")


def test_funnel_stages_account_correctly(spark):
    chunks, summary = curation_funnel(_docs(spark), url_col="url", keep_rate_pct=100)
    s = {r.stage_name: r.n_rows for r in summary.collect()}
    assert s["input"] == 5
    assert s["url_dedup"] == 4          # doc 2 folded into doc 1's URL
    assert s["exact_dedup"] == 3        # doc 3's content == doc 1's
    assert s["quality_gate"] == 2       # doc 4 too short
    assert s["subsample"] == 2          # 100% keep
    # chunk accounting equals the materialized chunk explosion
    assert s["chunks"] == chunks.count()
    assert set(r.doc_id for r in chunks.select("doc_id").distinct().collect()) == {1, 5}


def test_funnel_without_urls_and_sampling(spark):
    docs = _docs(spark).drop("url")
    chunks, summary = curation_funnel(docs, url_col=None, keep_rate_pct=80)
    s = {r.stage_name: r.n_rows for r in summary.collect()}
    assert s["input"] == 5 and s["url_dedup"] == 5  # stage pass-through
    assert s["exact_dedup"] == 3                    # 1==2==3 content
    # determinism under repartitioning
    _, summary2 = curation_funnel(docs.repartition(4), url_col=None, keep_rate_pct=80)
    assert sorted(map(tuple, summary2.collect())) == sorted(map(tuple, summary.collect()))
