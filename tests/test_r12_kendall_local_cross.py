"""Round-12 optimization tests: kendall_tau_b_bounded local+cross
rewrite (partition-local dominance + posexplode cross fold + the
discordant-side pairs identity 2(C+D) = nc(nc-1) - tx2 - ty2c + txy2).

The pre-existing brute-force tests (test_r9_wave19.py) cover fully
in-domain x. These pin the exact operator semantics the identity must
preserve when rows carry x values OUTSIDE x_values: concordant /
discordant / tx2 count only in-class pairs, while n and the y-tie mass
ty2 (the tau-b denominator) count ALL rows — and exercise the
cross-partition fold on a dataset whose tier table spans all 8 test
shuffle partitions, with heavy x/y/joint ties.
"""

from __future__ import annotations

import math
import random
from collections import Counter


def _ref(rows, x_values):
    """Brute force with the operator's exact semantics under
    out-of-domain x: dominance among in-class pairs only; n/ty2 over
    all rows."""
    xs = set(x_values)
    n = len(rows)
    in_cls = [(x, y) for x, y in rows if x in xs]
    conc = disc = 0
    for i in range(len(in_cls)):
        for j in range(i + 1, len(in_cls)):
            (x1, y1), (x2, y2) = in_cls[i], in_cls[j]
            s = (x1 - x2) * (y1 - y2)
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
    tx = Counter(x for x, _ in in_cls)
    ty = Counter(y for _, y in rows)
    n02 = n * (n - 1)
    tx2 = sum(t * (t - 1) for t in tx.values())
    ty2 = sum(t * (t - 1) for t in ty.values())
    sgn = 1 if conc >= disc else -1
    tau = None
    if n02 > tx2 and n02 > ty2:
        tau = sgn * math.floor(
            abs(conc - disc) * 2e6 / math.sqrt((n02 - tx2) * (n02 - ty2))
        )
    som = (
        sgn * ((abs(conc - disc) * 2_000_000) // (n02 - tx2))
        if n02 > tx2
        else None
    )
    gam = (
        sgn * ((abs(conc - disc) * 1_000_000) // (conc + disc))
        if conc + disc > 0
        else None
    )
    return conc, disc, tau, som, gam


class TestKendallLocalCross:
    def _run(self, spark, rows, x_values):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            kendall_tau_b_bounded,
        )

        df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
        out = kendall_tau_b_bounded(df, "g", "x", "y", x_values).collect()
        return {r["g"]: r for r in out}

    def test_multi_partition_with_out_of_domain_x(self, spark):
        rng = random.Random(12)
        x_values = list(range(1, 7))
        data = {}
        for g in ("a", "b", "c"):
            rows = []
            for _ in range(220):
                # ~1 in 8 rows carries an out-of-domain x (99): it
                # must count in n and the y-tie mass but never in
                # dominance or tx2
                x = 99 if rng.random() < 0.125 else rng.randint(1, 6)
                # small y range -> heavy y-ties and joint ties, and a
                # tier table wide enough to span every shuffle
                # partition of the range exchange
                y = rng.randint(1, 40) * 10
                rows.append((x, y))
            data[g] = rows
        flat = [(g, x, y) for g, rows in data.items() for x, y in rows]
        rng.shuffle(flat)
        got = self._run(spark, flat, x_values)
        assert set(got) == set(data)
        for g, rows in data.items():
            conc, disc, tau, som, gam = _ref(rows, x_values)
            r = got[g]
            assert r["concordant"] == float(conc), g
            assert r["discordant"] == float(disc), g
            assert r["tau_b_ppm"] == tau, g
            assert r["somers_d_ppm"] == som, g
            assert r["gamma_ppm"] == gam, g

    def test_degenerate_single_y_tier(self, spark):
        # every pair is a y-tie: conc = disc = 0, all ratios NULL
        rows = [("d", x, 500) for x in (1, 2, 3, 4, 5, 6) for _ in range(3)]
        got = self._run(spark, rows, list(range(1, 7)))
        r = got["d"]
        assert r["concordant"] == 0.0
        assert r["discordant"] == 0.0
        assert r["tau_b_ppm"] is None
        assert r["gamma_ppm"] is None

    def test_no_in_class_rows(self, spark):
        # all x out of domain: dominance empty, identity yields D = 0
        rows = [("e", 99, 10 * i) for i in range(1, 8)]
        got = self._run(spark, rows, list(range(1, 7)))
        r = got["e"]
        assert r["concordant"] == 0.0
        assert r["discordant"] == 0.0
        assert r["somers_d_ppm"] == 0
