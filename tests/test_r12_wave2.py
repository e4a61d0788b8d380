"""Round-12 wave-2 tests: GK tau, Little's law sessions, next-event
Gini, Clark-Evans, ARI, quartile dispersion, Lorenz asymmetry,
migration matrix."""

from __future__ import annotations

import datetime as dt
import math


def _q(name):
    from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

    return QUERIES[name]


def _gk_tau_ref(cells):
    """cells: {(status, prio): n} over statuses F/O/P, prios 1..5 —
    mirrors the query's fixed-order double expression."""
    statuses, prios = ["F", "O", "P"], [1, 2, 3, 4, 5]
    nn = sum(cells.values())
    row_sum = 0.0
    for s in statuses:
        r = sum(cells.get((s, p), 0) for p in prios)
        if r > 0:
            sq = sum(
                float(cells.get((s, p), 0)) * float(cells.get((s, p), 0))
                for p in prios
            )
            row_sum += sq / float(r)
    col_sq = sum(
        float(sum(cells.get((s, p), 0) for s in statuses)) ** 2 for p in prios
    )
    den = float(nn) * float(nn) - col_sq
    if den <= 0:
        return None
    return math.floor(1e6 * (float(nn) * row_sum - col_sq) / den)


class TestGkTau:
    def _run(self, spark, tmp_path, cells):
        rows = []
        k = 0
        names = {1: "1-URGENT", 2: "2-HIGH", 3: "3-MEDIUM", 4: "4-NOT", 5: "5-LOW"}
        for (s, p), n in cells.items():
            for _ in range(n):
                k += 1
                rows.append((k, s, names[p]))
        spark.createDataFrame(
            rows, "o_orderkey long, o_orderstatus string, o_orderpriority string"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        return _q("gk_tau_status_priority")(spark, str(tmp_path)).collect()[0]

    def test_perfect_association_is_one(self, spark, tmp_path):
        cells = {("F", 1): 5, ("O", 2): 7, ("P", 3): 3}
        r = self._run(spark, tmp_path, cells)
        assert r["gk_tau_ppm"] == 1000000

    def test_mixed_table_matches_reference(self, spark, tmp_path):
        cells = {
            ("F", 1): 4, ("F", 2): 1, ("O", 2): 6, ("O", 5): 2,
            ("P", 1): 1, ("P", 3): 5,
        }
        r = self._run(spark, tmp_path, cells)
        assert r["gk_tau_ppm"] == _gk_tau_ref(cells)
        assert 0 < r["gk_tau_ppm"] < 1000000


class TestLittlesLaw:
    def test_sessions_and_sweep(self, spark, tmp_path):
        t0 = dt.datetime(2000, 1, 1, 12, 0, 0)
        sec = lambda s: t0 + dt.timedelta(seconds=s)
        rows = [
            # user 1: one session [0, 600] (two events, gap 600 <= 1800)
            (1, 1, sec(0), "view", 0.0, ""),
            (2, 1, sec(600), "click", 0.0, ""),
            # user 1: second session [3000, 3000] (gap 2400 > 1800)
            (3, 1, sec(3000), "view", 0.0, ""),
            # user 2: one session [300, 700]
            (4, 2, sec(300), "view", 0.0, ""),
            (5, 2, sec(700), "purchase", 0.0, ""),
        ]
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts timestamp, event_type string,"
            " value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))
        r = _q("littles_law_sessions")(spark, str(tmp_path)).collect()[0]
        # sessions: [0,600], [3000,3000], [300,700] -> busy 600+0+400
        assert r["n_sessions"] == 3
        assert r["busy_sec"] == 1000
        assert r["span_sec"] == 3000
        assert r["l_avg_concurrency_milli"] == 1000 * 1000 // 3000
        assert r["lambda_per_hour_milli"] == 3 * 3600000 // 3000
        assert r["w_session_sec_milli"] == 1000 * 1000 // 3
        assert r["peak_concurrency"] == 2  # [300, 600] overlap


class TestNextEventGini:
    def test_deterministic_vs_uniform(self, spark, tmp_path):
        t0 = dt.datetime(2000, 1, 1)
        rows, eid = [], 0
        # user 1: a -> b -> a -> b  (a always followed by b and
        # b always by a: both deterministic, gini 0)
        for i, et in enumerate(["a", "b", "a", "b"]):
            eid += 1
            rows.append((eid, 1, t0 + dt.timedelta(seconds=i), et, 0.0, ""))
        # user 2: c -> a, and user 3: c -> b  (c splits 50/50)
        for u, nxt in ((2, "a"), (3, "b")):
            eid += 1
            rows.append((eid, u, t0, "c", 0.0, ""))
            eid += 1
            rows.append((eid, u, t0 + dt.timedelta(seconds=1), nxt, 0.0, ""))
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts timestamp, event_type string,"
            " value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))
        got = {
            r["event_type"]: (r["n_transitions"], r["gini_ppm"])
            for r in _q("next_event_gini")(spark, str(tmp_path)).collect()
        }
        assert got["a"] == (2, 0)
        assert got["b"] == (1, 0)
        assert got["c"] == (2, 500000)


class TestClarkEvans:
    def test_matches_python_reference(self, spark, tmp_path):
        def mix32(k, salt):
            s = (k % 2**32 + salt * 40503) % 2**32
            s = ((s ^ (s >> 16)) * 73244475) % 2**32
            return s ^ (s >> 16)

        keys = list(range(1, 401))
        spark.createDataFrame(
            [(k,) for k in keys], "c_custkey long"
        ).write.parquet(str(tmp_path / "customer.parquet"))
        pts = {k: (mix32(k, 1) % 4000, mix32(k, 2) % 4000) for k in keys}
        cells = {}
        for k, (x, y) in pts.items():
            cells.setdefault((x // 100, y // 100), []).append(k)
        m, sq20 = 0, 0
        for k, (x, y) in pts.items():
            cx, cy = x // 100, y // 100
            best = None
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for k2 in cells.get((cx + dx, cy + dy), []):
                        if k2 == k:
                            continue
                        x2, y2 = pts[k2]
                        d2 = (x - x2) ** 2 + (y - y2) ** 2
                        if best is None or d2 < best:
                            best = d2
            if best is not None:
                m += 1
                sq20 += math.floor(math.sqrt(float(best)) * 1048576.0)
        r = _q("clark_evans_grid")(spark, str(tmp_path)).collect()[0]
        assert r["n_points"] == 400
        assert r["n_with_ring_neighbor"] == m
        mean_nn = sq20 / (1048576.0 * m)
        assert r["mean_nn_milli"] == math.floor(mean_nn * 1e3)
        assert r["clark_evans_r_milli"] == math.floor(
            1e3 * mean_nn * 2.0 * math.sqrt(400.0 / 16000000.0)
        )


class TestAri:
    def test_identical_partitions_ari_one(self, spark, tmp_path):
        # label == bucket sign pattern exactly: dims (1,2) signs encode
        # labels 0..3 -> ARI = 1
        rows = []
        for i in range(40):
            lab = i % 4
            v1 = 1.0 if lab & 2 else -1.0
            v2 = 1.0 if lab & 1 else -1.0
            rows.append((i, [v1, v2, 0.5], lab))
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(str(tmp_path / "embeddings.parquet"))
        r = _q("ari_label_buckets_embeddings")(spark, str(tmp_path)).collect()[0]
        assert r["n_vectors"] == 40
        assert r["ari_ppm"] == 1000000

    def test_independent_partitions_near_zero(self, spark, tmp_path):
        # labels assigned orthogonally to the sign buckets: every
        # (label, bucket) cell equal size. sp = 8*C(5,2) = 80,
        # a = 2*C(20,2) = 380, b = 4*C(10,2) = 180, t = C(40,2) = 780
        # -> ARI = (2*780*80 - 2*380*180)/(780*(380+180) - 2*380*180)
        #        = -12000/300000 = -0.04 exactly (slightly below 0,
        # as balanced-but-finite tables are)
        rows = []
        i = 0
        for lab in range(2):
            for b in range(4):
                for _ in range(5):
                    v1 = 1.0 if b & 2 else -1.0
                    v2 = 1.0 if b & 1 else -1.0
                    rows.append((i, [v1, v2, 0.0], lab))
                    i += 1
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(str(tmp_path / "embeddings.parquet"))
        r = _q("ari_label_buckets_embeddings")(spark, str(tmp_path)).collect()[0]
        assert r["ari_ppm"] == -40000


class TestQuartileDispersion:
    def test_rank_picks_match_sorted_reference(self, spark, tmp_path):
        import random

        rng = random.Random(12)
        lines, parts = [], [(1, "BRAND#A"), (2, "BRAND#B")]
        vals = {1: [], 2: []}
        for i in range(200):
            pk = 1 + (i % 2)
            d = rng.randint(100, 99999) / 100.0
            vals[pk].append(round(d * 100))
            lines.append((i, pk, float(d)))
        spark.createDataFrame(
            parts, "p_partkey long, p_brand string"
        ).write.parquet(str(tmp_path / "part.parquet"))
        spark.createDataFrame(
            lines, "l_orderkey long, l_partkey long, l_extendedprice double"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        got = {
            r["brand"]: r
            for r in _q("quartile_dispersion_brands")(spark, str(tmp_path)).collect()
        }
        for pk, brand in ((1, "BRAND#A"), (2, "BRAND#B")):
            xs = sorted(vals[pk])
            n = len(xs)
            q1 = xs[(n + 3) // 4 - 1]
            q3 = xs[(3 * n + 3) // 4 - 1]
            r = got[brand]
            assert (r["n"], r["q1_cents"], r["q3_cents"]) == (n, q1, q3)
            assert r["qcd_ppm"] == math.floor(1e6 * (q3 - q1) / (q3 + q1))


class TestLorenzAsymmetry:
    def test_small_spenders_vs_giant(self, spark, tmp_path):
        # spends 1, 1, 1, 97 dollars: mean 25 -> m=3 below, Lm=300 cents
        rows = [(k, k, float(v)) for k, v in ((1, 1), (2, 1), (3, 1), (4, 97))]
        spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_totalprice double"
        ).write.parquet(str(tmp_path / "orders.parquet"))
        r = _q("lorenz_asymmetry_customers")(spark, str(tmp_path)).collect()[0]
        n, t, m, lm = 4, 10000, 3, 300
        assert (r["n_customers"], r["n_below_mean"]) == (n, m)
        assert r["lorenz_asymmetry_ppm"] == math.floor(
            1e6 * (m * t + lm * n) / (n * t)
        )


class TestMigrationMatrix:
    def test_tertile_moves(self, spark, tmp_path):
        rows = []
        k = 0
        # y0 = 1998, y1 = 1999 (2000 is the partial anchor year)
        # 6 customers, spend rank order flips between years
        y0 = {1: 10, 2: 20, 3: 30, 4: 40, 5: 50, 6: 60}
        y1 = {1: 60, 2: 50, 3: 40, 4: 30, 5: 20, 6: 10}
        for yr, spends in ((1998, y0), (1999, y1)):
            for c, d in spends.items():
                k += 1
                rows.append((k, c, dt.datetime(yr, 5, 1), float(d)))
        k += 1
        rows.append((k, 1, dt.datetime(2000, 1, 1), 1.0))  # anchor year
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderdate timestamp,"
            " o_totalprice double",
        ).write.parquet(str(tmp_path / "orders.parquet"))
        got = {
            (r["tier_from"], r["tier_to"]): r["n_customers"]
            for r in _q("customer_migration_matrix")(spark, str(tmp_path)).collect()
        }
        # tertile thresholds (n=6): t1 = 2nd smallest, t2 = 4th
        # y0: t1=20 t2=40 -> low {1,2} mid {3,4} high {5,6}
        # y1 flips the ranking -> every cell is a pure swap
        assert got == {
            ("low", "high"): 2,
            ("mid", "mid"): 2,
            ("high", "low"): 2,
        }
