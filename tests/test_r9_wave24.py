"""Round-9 wave-24 tests: k-means validity indices."""

from __future__ import annotations


class TestKmeansValidity:
    def _run(self, spark, vectors, k=2, iterations=2):
        from dpe_energy_performance_analysis_etl_spark.operators.ml import (
            kmeans_validity_indices,
        )

        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
            "vec_id bigint, embedding array<double>",
        )
        out = kmeans_validity_indices(df, k=k, iterations=iterations).collect()
        return {r["cluster"]: r for r in out}

    def test_well_separated_blobs_high_scores(self, spark):
        # two tight far-apart blobs; seeds (ids 0, 1) land one in each
        blob_a = [[0.0, 0.0], [0.01, 0.0], [0.0, 0.01], [0.01, 0.01]]
        blob_b = [[5.0, 5.0], [5.01, 5.0], [5.0, 5.01], [5.01, 5.01]]
        vecs = [blob_a[0], blob_b[0]] + blob_a[1:] + blob_b[1:]
        got = self._run(spark, vecs, k=2)
        assert len(got) == 2
        for r in got.values():
            assert r["n_members"] == 4
            assert r["mean_silhouette_ppm"] > 950_000  # near-perfect
            assert r["n_negative"] == 0
            assert r["ch_ppm"] > 100 * 10**6  # B >> W
        assert len({r["ch_ppm"] for r in got.values()}) == 1  # global scalar

    def test_single_surviving_cluster_null_ch(self, spark):
        # all points identical: both seeds coincide; every point goes
        # to the lower seed id and the other cluster empties
        vecs = [[1.0, 1.0]] * 5
        got = self._run(spark, vecs, k=2)
        assert len(got) == 1
        r = next(iter(got.values()))
        assert r["ch_ppm"] is None  # kk = 1 or w = 0 guard
        assert r["mean_silhouette_ppm"] == 0  # max(a2,b2) = 0 branch

    def test_overlapping_blob_low_silhouette(self, spark):
        import random

        rng = random.Random(13)
        vecs = [[rng.uniform(0, 1), rng.uniform(0, 1)] for _ in range(40)]
        got = self._run(spark, vecs, k=2)
        # one uniform blob split in two: the squared-distance variant
        # inflates ratios, but the score must still sit clearly below
        # the >0.95 of genuinely separated blobs
        for r in got.values():
            assert r["mean_silhouette_ppm"] < 850_000

    def test_matches_python_reference(self, spark):
        import random

        rng = random.Random(21)
        vecs = [[rng.uniform(-1, 1), rng.uniform(-1, 1)] for _ in range(12)]
        got = self._run(spark, vecs, k=3)

        # python mirror of the integer pipeline
        def iv(v):
            import math

            return [int(math.floor(x * 1024)) + 1024 for x in v]

        pts = {i: iv(v) for i, v in enumerate(vecs)}
        cents = {i: pts[i] for i in range(3)}

        def d2(a, b):
            return sum((x - y) ** 2 for x, y in zip(a, b))

        assign = {}
        for _ in range(2):
            assign = {
                i: min(cents, key=lambda c: (d2(p, cents[c]), c))
                for i, p in pts.items()
            }
            new = {}
            for c in set(assign.values()):
                mem = [pts[i] for i in pts if assign[i] == c]
                new[c] = [
                    sum(m[d] for m in mem) // len(mem) for d in range(2)
                ]
            cents = new
        per = {}
        for i, p in pts.items():
            own = assign[i]
            a2 = d2(p, cents[own])
            b2 = min(d2(p, cents[c]) for c in cents if c != own)
            m = max(a2, b2)
            s = 0 if m == 0 else (1 if b2 >= a2 else -1) * (
                abs(b2 - a2) * 10**6 // m
            )
            per.setdefault(own, []).append((s, b2 < a2, a2))
        for c, rows in per.items():
            r = got[c]
            ssum = sum(s for s, _, _ in rows)
            sign = 1 if ssum >= 0 else -1
            assert r["n_members"] == len(rows)
            assert r["mean_silhouette_ppm"] == sign * (abs(ssum) // len(rows))
            assert r["n_negative"] == sum(1 for _, neg, _ in rows if neg)
