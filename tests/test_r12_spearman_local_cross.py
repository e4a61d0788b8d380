"""Round-12 optimization tests: grouped_spearman local+cross rewrite
(x-side midrank join only; y-rank moments expanded into per-partition
partials via grouped_local_prefix / partition_offsets and folded at
the bounded (partition, group) level).

The pre-existing tests (test_r9_wave9.py) cover ties / constants /
monotonicity on single-partition data. These pin the two things the
rewrite must preserve beyond them: (1) the exact NULL semantics of the
old dual-inner-join recipe — ranks on each axis count ALL rows of the
group (a NULL on the other axis still feeds the prefix mass, and the
NULL tier itself sorts first), while n and every moment sum cover only
rows non-NULL on both, and a group with no such row produces NO output
row; (2) the cross-partition fold, on data whose (group, y) tier table
spans all 8 test shuffle partitions of the range exchange.
"""

from __future__ import annotations

import math
import random
from collections import Counter


def _ref(pairs):
    """Brute force with the operator's exact semantics under NULLs:
    per-axis doubled mid-ranks over ALL rows (NULL tier first, feeding
    the prefix), moments over both-non-NULL rows only."""

    def mr2_map(vals):
        cnt = Counter(vals)
        out, before = {}, cnt.get(None, 0)
        for v in sorted(v for v in cnt if v is not None):
            out[v] = 2 * before + cnt[v] + 1
            before += cnt[v]
        return out

    mx = mr2_map([x for x, _ in pairs])
    my = mr2_map([y for _, y in pairs])
    both = [(x, y) for x, y in pairs if x is not None and y is not None]
    n = len(both)
    if n == 0:
        return None
    sxy = sum(mx[x] * my[y] for x, y in both)
    sxx = sum(mx[x] * mx[x] for x, _ in both)
    syy = sum(my[y] * my[y] for _, y in both)
    cn = n * (n + 1) * (n + 1)
    if sxx <= cn or syy <= cn:
        return (n, None)
    num = sxy - cn
    sign = 1 if num >= 0 else -1
    return (
        n,
        sign * math.floor(abs(num) * 1e6 / math.sqrt((sxx - cn) * (syy - cn))),
    )


class TestSpearmanLocalCross:
    def _run(self, spark, rows):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            grouped_spearman,
        )

        df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
        return {r["g"]: r for r in grouped_spearman(df, "g", "x", "y").collect()}

    def test_multi_partition_fold_with_nulls(self, spark):
        rng = random.Random(7)
        data = {}
        for g in ("a", "b", "c"):
            pairs = []
            for _ in range(400):
                # ~300 distinct y per group -> the (g, y) tier table
                # spans every shuffle partition of the range exchange,
                # so nonzero cross-partition offsets are exercised
                x = None if rng.random() < 0.15 else rng.randint(1, 8)
                y = None if rng.random() < 0.15 else rng.randint(1, 300) * 7
                pairs.append((x, y))
            data[g] = pairs
        flat = [(g, x, y) for g, pairs in data.items() for x, y in pairs]
        rng.shuffle(flat)
        got = self._run(spark, flat)
        assert set(got) == set(data)
        for g, pairs in data.items():
            n, rho = _ref(pairs)
            assert got[g]["n"] == n, g
            assert got[g]["rho_ppm"] == rho, g

    def test_all_null_side_drops_group(self, spark):
        # old recipe: inner joins left no ranked row for 'dead' -> no
        # output row; 'live' must be unaffected by its presence
        rows = [("dead", x, None) for x in (1, 2, 3, 4)]
        rows += [("live", i, 10 * i) for i in range(1, 8)]
        got = self._run(spark, rows)
        assert set(got) == {"live"}
        assert got["live"]["rho_ppm"] == 1_000_000

    def test_null_mass_feeds_other_axis_ranks(self, spark):
        # a row with NULL x still shifts the y-ranks of every other
        # row (and vice versa) — exactly what the old recipe computed
        pairs = [(None, 5), (1, 7), (2, 5), (3, None), (3, 9), (4, 2)]
        rows = [("t", a, b) for a, b in pairs]
        got = self._run(spark, rows)
        n, rho = _ref(pairs)
        assert got["t"]["n"] == n
        assert got["t"]["rho_ppm"] == rho
