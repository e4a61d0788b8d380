"""Property-based tests (hypothesis) for the pure-Python layers —
the reference has no property tests at all (SURVEY §5); these cover
the invariants the example-based tests can't enumerate."""

import math
import re

import numpy as np
from hypothesis import given, settings, strategies as st

from dpe_energy_performance_analysis_etl_spark.operators.stats import (
    betainc_reg,
    t_sf_two_sided,
    ttest_rel,
    wilcoxon,
)
from dpe_energy_performance_analysis_etl_spark.utils import normalize_name


@given(st.text(max_size=60))
def test_normalize_name_idempotent_and_clean(name):
    once = normalize_name(name)
    assert normalize_name(once) == once  # idempotent
    assert re.fullmatch(r"[0-9a-z_]*", once)  # slug alphabet only
    assert "__" not in once  # runs collapsed


@given(st.floats(0.01, 100), st.floats(1, 500))
def test_t_sf_is_probability_and_monotone(t, df):
    p = t_sf_two_sided(t, df)
    assert 0.0 <= p <= 1.0
    assert t_sf_two_sided(t + 1.0, df) <= p + 1e-12  # larger |t| -> smaller p


@given(st.floats(0.1, 20), st.floats(0.1, 20), st.floats(0.001, 0.999))
def test_betainc_bounds_and_symmetry(a, b, x):
    v = betainc_reg(a, b, x)
    assert -1e-12 <= v <= 1 + 1e-12
    assert abs(v + betainc_reg(b, a, 1 - x) - 1.0) < 1e-9


@given(
    st.lists(st.floats(-100, 100, allow_nan=False), min_size=2, max_size=40),
)
@settings(max_examples=50)
def test_ttest_symmetry(diffs):
    x = np.array(diffs)
    y = np.zeros_like(x)
    t1, p1 = ttest_rel(x, y)
    t2, p2 = ttest_rel(y, x)  # swapping sides flips t, keeps p
    if not math.isnan(t1):
        assert t1 == -t2 or (math.isinf(t1) and math.isinf(t2))
        if not math.isnan(p1):
            assert abs(p1 - p2) < 1e-12


@given(
    st.lists(
        st.floats(-50, 50, allow_nan=False).filter(lambda v: abs(v) > 1e-6),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=50)
def test_wilcoxon_statistic_bounds(diffs):
    x = np.array(diffs)
    w, p = wilcoxon(x, np.zeros_like(x))
    n = len(diffs)
    assert 0 <= w <= n * (n + 1) / 2
    assert (0.0 <= p <= 1.0) or math.isnan(p)


# ---------------------------------------------------------------------
# Exact-cents aggregation invariants (operators/exact.py): the scaled-
# integer path must agree with the decimal-cast path for any value
# whose true decimal expansion fits the scale — including negatives,
# zero, and values adjacent to rounding boundaries.
# ---------------------------------------------------------------------


@given(
    st.integers(min_value=-(10**13), max_value=10**13),
    st.integers(min_value=0, max_value=6),
)
@settings(max_examples=300, deadline=None)
def test_scaled_long_matches_exact_decimal(unscaled, scale):
    """For x = unscaled / 10^scale (exact s-dp value), floor(x*10^s+.5)
    recovers unscaled — same result the DECIMAL(p,s) cast would give —
    despite x's binary representation being off by ~1 ulp."""
    x = unscaled / (10**scale)
    got = math.floor(x * float(10**scale) + 0.5)
    assert got == unscaled, (unscaled, scale, x, got)


@given(
    st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=50),
    st.integers(min_value=0, max_value=4),
)
@settings(max_examples=100, deadline=None)
def test_cents_sum_is_partition_order_free(cents, scale):
    """Integer sums are associative/commutative: any partitioning and
    ordering of the partials reproduces the same total — the property
    that makes exact_sum_agg deterministic across cluster layouts."""
    total = sum(cents)
    for cut in range(1, len(cents)):
        assert sum(cents[:cut]) + sum(cents[cut:]) == total
    assert sum(reversed(cents)) == total


# ---------------------------------------------------------------------
# Misra-Gries fold (operators/heavyhitters._mg_fold) — the per-batch
# kernel the distributed pipeline is built from
# ---------------------------------------------------------------------


@given(
    st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=60, deadline=None)
def test_mg_fold_guarantees(stream, k):
    """∀ streams and capacities: ≤ k counters survive, no counter
    overcounts, and the undercount is ≤ n/(k+1) — the MG invariants
    the distributed error bound is assembled from."""
    import pandas as pd
    from collections import Counter
    from dpe_energy_performance_analysis_etl_spark.operators.heavyhitters import _mg_fold

    counts: dict = {}
    # fold in a few uneven batches to exercise the batched decrement
    for i in range(0, len(stream), 37):
        batch = pd.Series(stream[i : i + 37]).value_counts()
        _mg_fold(counts, batch, k)
    true = Counter(stream)
    assert len(counts) <= k
    for item, c_hat in counts.items():
        assert c_hat <= true[item]
        assert true[item] - c_hat <= len(stream) / (k + 1)


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
)
@settings(max_examples=40, deadline=None)
def test_resize_kernels_shape_and_range(h, w, oh, ow):
    """∀ sizes: output shape is exactly (oh, ow[, C]), dtype uint8,
    and every output pixel lies within the input's [min, max] (both
    kernels interpolate, never extrapolate)."""
    import numpy as np
    from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import (
        resize_bilinear,
        resize_nearest,
    )

    rng = np.random.default_rng(h * 131 + w * 7 + oh * 3 + ow)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    for kernel in (resize_nearest, resize_bilinear):
        out = kernel(img, oh, ow)
        assert out.shape == (oh, ow, 3)
        assert out.dtype == np.uint8
        assert out.min() >= img.min() and out.max() <= img.max()


# ---- round-3 third-wave invariants (pure-Python mirrors of the
# column-expression formulas) ----

def _del_variants(s: str) -> set:
    return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(st.text(alphabet="abc", max_size=8), st.text(alphabet="abc", max_size=8))
@settings(max_examples=300)
def test_deletion_neighborhood_never_misses_ed1(s, t):
    """Completeness of the FastSS candidate scheme
    (operators/entity.py): strings within edit distance 1 ALWAYS
    share a deletion variant — the equi-join can't lose a match."""
    if _lev(s, t) <= 1:
        assert _del_variants(s) & _del_variants(t)


@given(st.text(alphabet="ab", min_size=1, max_size=10))
@settings(max_examples=200)
def test_wordpiece_pieces_rejoin(word):
    from dpe_energy_performance_analysis_etl_spark.text.tokenizer import (
        UNK,
        _index_vocab,
        wordpiece_word,
    )

    vocab = ["a", "##a", "##b", "ab", "##ba"]  # no start 'b': some words UNK
    starts, conts, max_len = _index_vocab(vocab)
    pieces = wordpiece_word(word, starts, conts, max_len)
    if pieces != [UNK]:
        assert "".join(p.removeprefix("##") for p in pieces) == word
        # Greedy: the first piece is the longest vocab prefix.
        prefixes = [v for v in ("ab", "a") if word.startswith(v)]
        assert pieces[0] == max(prefixes, key=len)


@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_subnormal=False).filter(
            lambda v: v == 0.0 or abs(v) > 1e-300  # halving subnormals underflows
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=200)
def test_dyadic_ewma_constant_series_fixed_point(values):
    """The renormalized dyadic EWMA of a CONSTANT series equals the
    constant exactly (weights are powers of two -> exact floats)."""
    c = values[0]
    n = len(values)
    wsum = sum(c / (1 << (i + 1)) for i in range(n))
    norm = 1.0 - 1.0 / (1 << n)
    if norm > 0:
        assert wsum / norm == c or abs(wsum / norm - c) <= abs(c) * 1e-15


@given(st.integers(0, 10**9))
def test_sampling_hash_and_weights_in_range(key):
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
        WEIGHT_MOD,
        WEIGHT_MULT,
    )

    bucket = ((key * 2654435761) % 2**32) % 10000
    assert 0 <= bucket < 10000
    w = (bucket % 1024) * WEIGHT_MULT % WEIGHT_MOD - 1000
    assert -1000 <= w <= 1000


@given(
    st.floats(-5, 15, allow_nan=False),
    st.floats(-5, 15, allow_nan=False),
    st.floats(1, 8),
    st.floats(1, 8),
)
@settings(max_examples=300)
def test_ray_cast_matches_halfplane_on_rectangles(px, py, w, h):
    """The even-odd crossing fold (operators/spatial.py) agrees with
    the direct interval test on axis-aligned rectangles (skipping
    exact-boundary points, where IEEE comparison order decides)."""
    verts = [(0.0, 0.0), (0.0, h), (w, h), (w, 0.0)]
    n = len(verts)
    crossings = 0
    for i in range(n):
        xi, yi = verts[i]
        xj, yj = verts[(i + 1) % n]
        if (yi > py) != (yj > py) and px < (xj - xi) * (py - yi) / (yj - yi) + xi:
            crossings += 1
    on_boundary = px in (0.0, w) or py in (0.0, h)
    if not on_boundary:
        assert (crossings % 2 == 1) == (0.0 < px < w and 0.0 < py < h)


# ---------------------------------------------------------------------
# Round 4: brute-force equivalence properties for the new relational
# analytics (pure-python references; Spark round-trips are covered by
# their own suites — these pin the ALGEBRA on adversarial shapes).
# ---------------------------------------------------------------------

@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 15)), min_size=1, max_size=40
    )
)
@settings(max_examples=200, deadline=None)
def test_interval_islands_reference(pairs):
    """The gaps-and-islands rule (start > running max end => break)
    merges to exactly the union of intervals."""
    iv = sorted((s, s + l) for s, l in pairs)
    # reference: coverage by sweeping a boolean line
    covered = set()
    for s, e in iv:
        covered.update(range(s, e))
    # islands by the operator's rule
    islands = []
    for s, e in iv:
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
        else:
            islands.append([s, e])
    total = sum(e - s for s, e in islands)
    assert total == len(covered)
    # islands are maximal: gaps between consecutive islands nonempty
    for (s1, e1), (s2, e2) in zip(islands, islands[1:]):
        assert s2 > e1


@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=25
    )
)
@settings(max_examples=200, deadline=None)
def test_pareto_tier_rule_matches_brute_force(points):
    """Tier-max + strictly-better running max == brute-force dominance
    filter, including duplicates and dense ties."""
    def dominated(p, q):  # q dominates p (maximizing both)
        return q[0] >= p[0] and q[1] >= p[1] and q != p

    brute = {
        p
        for p in points
        if not any(dominated(p, q) for q in points if (q[0] > p[0] or q[1] > p[1]))
    }
    # the operator's rule
    tiers = {}
    for x, y in points:
        tiers[x] = max(tiers.get(x, -1), y)
    front = set()
    best = -1
    for x in sorted(tiers, reverse=True):
        if tiers[x] > best:
            front.add((x, tiers[x]))
            best = tiers[x]
    got = {p for p in points if p in front}
    assert got == brute
