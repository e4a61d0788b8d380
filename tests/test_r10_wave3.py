"""Round-10 wave-3 tests: Quade test, JM query likelihood, Chow
structural break."""

from __future__ import annotations

import datetime as dt


def _grid_parquet(spark, tmp_path, blocks):
    orows, crows, nrows = [], [], []
    for bi, (name, vals) in enumerate(sorted(blocks.items())):
        nrows.append((bi, name))
        crows.append((bi + 1, bi))
        for pr, dollars in enumerate(vals, start=1):
            orows.append((bi + 1, f"{pr}-X", dt.date(1995, 1, 5), float(dollars)))
    spark.createDataFrame(
        orows,
        "o_custkey bigint, o_orderpriority string,"
        " o_orderdate date, o_totalprice double",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        crows, "c_custkey bigint, c_nationkey bigint"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        nrows, "n_nationkey bigint, n_name string"
    ).write.parquet(str(tmp_path / "nation.parquet"))
    return str(tmp_path)


class TestQuade:
    def _run(self, spark, tmp_path, blocks):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        return QUERIES["quade_test_nations"](
            spark, _grid_parquet(spark, tmp_path, blocks)
        ).collect()[0]

    @staticmethod
    def _ref(blocks):
        names = sorted(blocks)
        k = len(next(iter(blocks.values())))
        # within-block ranks (value, then treatment index tie-break)
        ranks = {}
        for name in names:
            vals = blocks[name]
            order = sorted(range(k), key=lambda j: (vals[j], j))
            r = [0] * k
            for pos, j in enumerate(order, start=1):
                r[j] = pos
            ranks[name] = r
        rng = {name: max(blocks[name]) - min(blocks[name]) for name in names}
        qorder = sorted(names, key=lambda nm: (rng[nm], nm))
        q = {nm: i + 1 for i, nm in enumerate(qorder)}
        s = {
            (nm, j): q[nm] * (2 * ranks[nm][j] - k - 1)
            for nm in names
            for j in range(k)
        }
        a2 = sum(v * v for v in s.values())
        bsum = sum(
            sum(s[(nm, j)] for nm in names) ** 2 for j in range(k)
        )
        b = len(names)
        den = b * a2 - bsum
        t3 = ((b - 1) * bsum * 1_000_000) // den if den > 0 else None
        return a2, bsum, t3

    def test_consistent_ordering_high_t3(self, spark, tmp_path):
        blocks = {f"N{i}": [10, 20, 30, 40, 50 + i] for i in range(4)}
        r = self._run(spark, tmp_path, blocks)
        a2, bsum, t3 = self._ref(blocks)
        assert (r["a2_sum"], r["b_sum"], r["t3_ppm"]) == (a2, bsum, t3)
        assert r["t3_ppm"] > 1_000_000  # strong consistent effect

    def test_shuffled_blocks_match_reference(self, spark, tmp_path):
        blocks = {
            "A": [30, 10, 20, 50, 40],
            "B": [10, 50, 30, 20, 40],
            "C": [40, 30, 50, 10, 20],
        }
        r = self._run(spark, tmp_path, blocks)
        a2, bsum, t3 = self._ref(blocks)
        assert (r["a2_sum"], r["b_sum"], r["t3_ppm"]) == (a2, bsum, t3)


class TestJMQueryLikelihood:
    def _run(self, spark, tmp_path, docs):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)], "doc_id bigint, text string"
        ).write.parquet(str(tmp_path / "documents.parquet"))
        return QUERIES["jm_query_likelihood_docs"](spark, str(tmp_path)).collect()

    def test_scores_and_ranking(self, spark, tmp_path):
        docs = [
            "spark join window spark",        # heavy match, dl 4
            "spark alpha beta gamma delta",   # one match, dl 5
            "nothing to see here at all",     # no match -> excluded
            "join join window other",         # dl 4
        ]
        out = self._run(spark, tmp_path, docs)
        by_id = {r["doc_id"]: r for r in out}
        assert 2 not in by_id  # unmatched doc excluded
        # reference: C = total tokens, cfsum = cf(spark)+cf(join)+cf(window)
        toks = [d.split() for d in docs]
        c = sum(len(t) for t in toks)
        cfsum = sum(
            sum(1 for w in t if w in ("spark", "join", "window")) for t in toks
        )
        for i in (0, 1, 3):
            dl = len(toks[i])
            tfm = sum(1 for w in toks[i] if w in ("spark", "join", "window"))
            exp = ((tfm * c + dl * cfsum) * 1_000_000) // (2 * dl * c)
            assert by_id[i]["score_ppm"] == exp, i
        # doc 0 has the densest match -> rank 1
        assert by_id[0]["rank"] == 1


class TestChowBreak:
    def _run(self, spark, tmp_path, monthly):
        """monthly: list of (date, dollars)."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            [(d, float(v)) for d, v in monthly],
            "o_orderdate date, o_totalprice double",
        ).write.parquet(str(tmp_path / "orders.parquet"))
        return QUERIES["chow_break_revenue"](spark, str(tmp_path)).collect()[0]

    @staticmethod
    def _series(pre, post):
        out = []
        for k, v in enumerate(pre):
            y, m = divmod(k, 12)
            out.append((dt.date(1994 + y, m + 1, 10), v))
        for k, v in enumerate(post):
            y, m = divmod(k, 12)
            out.append((dt.date(1996 + y, m + 1, 10), v))
        return out

    def test_clear_break_large_f(self, spark, tmp_path):
        # slope +10 before the break, slope -10 after, with wiggle so
        # segment SSEs are non-zero
        pre = [1000 + 10 * k + (3 if k % 2 else -3) for k in range(12)]
        post = [2000 - 10 * k + (3 if k % 2 else -3) for k in range(12)]
        r = self._run(spark, tmp_path, self._series(pre, post))
        assert r["n_pre"] == 12 and r["n_post"] == 12
        assert r["f_milli"] is not None and r["f_milli"] > 20_000

    def test_no_break_small_f(self, spark, tmp_path):
        # one line with the same wiggle throughout: pooled fit ~ as
        # good as split fits -> F near 0
        pre = [1000 + 10 * k + (3 if k % 2 else -3) for k in range(12)]
        post = [1120 + 10 * k + (3 if k % 2 else -3) for k in range(12)]
        r = self._run(spark, tmp_path, self._series(pre, post))
        assert r["f_milli"] is not None and r["f_milli"] < 2_000

    def test_zero_residuals_null(self, spark, tmp_path):
        pre = [1000 + 10 * k for k in range(6)]
        post = [1500 - 10 * k for k in range(6)]
        r = self._run(spark, tmp_path, self._series(pre, post))
        assert r["f_milli"] is None  # perfect segment fits, SSE = 0
