"""Zipfian-corpus proof for the AllPairs prefix filter (VERDICT r5
ask #4).

The carried watch item: on the driver's UNIFORM-vocabulary synthetic
documents even the rarest shingles have df 5-10, so prefix postings
dominate and ``prefix_filter_jaccard_join`` pays more than the plain
posting join (``shingle_pairs_jaccard``). The filter's design claim
(Bayardo WWW'07) is about real, Zipf-distributed text where most
shingles are near-unique. This tool generates exactly that fixture —
a seeded Zipf(s) token corpus at sf0.1-equivalent document count with
injected near-duplicate pairs — and times both operators cold-cache
on it with the bench's calibration workload, so the numbers are
NOTES-comparable.

Usage: python tools/zipf_fixture_bench.py [n_docs] [zipf_s]
Writes the fixture to /tmp/zipf_docs.parquet, prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def make_zipf_corpus(
    n_docs: int = 5000,
    vocab: int = 50_000,
    zipf_s: float = 1.1,
    mean_len: int = 150,
    dup_rate: float = 0.05,
    seed: int = 42,
):
    """Seeded Zipf token corpus: each doc is `len` draws from a
    Zipf(s) rank distribution over `vocab` words; `dup_rate` of docs
    are near-copies of an earlier doc with ~10% token perturbation
    (the true-pair payload)."""
    rng = np.random.default_rng(seed)
    # normalized Zipf pmf over a FIXED vocab (np.random.zipf is
    # unbounded; truncate-and-renormalize keeps ids in-vocab)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    pmf = ranks ** (-zipf_s)
    pmf /= pmf.sum()
    docs = []
    texts = []
    for i in range(n_docs):
        if i > 0 and rng.random() < dup_rate:
            src = int(rng.integers(0, i))
            toks = list(docs[src])
            n_swap = max(1, len(toks) // 10)
            for _ in range(n_swap):
                pos = int(rng.integers(0, len(toks)))
                toks[pos] = int(rng.choice(vocab, p=pmf)) + 1
        else:
            ln = max(20, int(rng.normal(mean_len, mean_len / 4)))
            toks = (rng.choice(vocab, size=ln, p=pmf) + 1).tolist()
        docs.append(toks)
        texts.append(" ".join(f"w{t}" for t in toks))
    return texts


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from dpe_energy_performance_analysis_etl_spark import get_spark
    from dpe_energy_performance_analysis_etl_spark.dedup.setsim import (
        prefix_filter_jaccard_join,
    )
    from dpe_energy_performance_analysis_etl_spark.dedup.shingles import (
        shingle_pairs_jaccard,
    )

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    zipf_s = float(sys.argv[2]) if len(sys.argv) > 2 else 1.1
    spark = get_spark("zipf_fixture")

    texts = make_zipf_corpus(n_docs=n_docs, zipf_s=zipf_s)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    path = "/tmp/zipf_docs.parquet"
    df.write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)

    # same calibration workload as bench.py: fixed JVM arithmetic loop
    spark.range(100_000_000).selectExpr("sum(id * 2 + 1)").collect()  # warm
    t0 = time.time()
    spark.range(100_000_000).selectExpr("sum(id * 2 + 1)").collect()
    calib = time.time() - t0

    results = {}
    for name, fn in [
        ("plain_posting_join", lambda d: shingle_pairs_jaccard(d, threshold=0.5)),
        ("prefix_filter_join", lambda d: prefix_filter_jaccard_join(d, threshold=0.5)),
    ]:
        times = []
        n_pairs = None
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            n_pairs = fn(docs).count()
            times.append(time.time() - t0)
        results[name] = {"sec": round(min(times), 3), "pairs": n_pairs}

    out = {
        "fixture": {"n_docs": n_docs, "zipf_s": zipf_s, "vocab": 50_000},
        "calib_sec": round(calib, 3),
        **results,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
