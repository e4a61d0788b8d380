"""Unit tests for the bench/scale harness logic patched per VERDICT r7
ask #3 and ADVICE r7 — pure-Python, no SparkSession needed."""

from __future__ import annotations

import json

import bench
from tools.scale_bench_waves import compute_flags


class TestLatestPriorRecord:
    def test_skips_non_numeric_suffixes(self, tmp_path):
        (tmp_path / "BENCH_rX.json").write_text("{}")
        (tmp_path / "BENCH_r3.json").write_text(
            json.dumps({"calib_sec": 0.3, "queries": {"a": 1.0}})
        )
        rec = bench._latest_prior_record(here=str(tmp_path))
        assert rec == {"calib_sec": 0.3, "queries": {"a": 1.0}}

    def test_excludes_current_round_and_later(self, tmp_path, monkeypatch):
        for r, calib in [(6, 0.1), (7, 0.2), (8, 0.9)]:
            (tmp_path / f"BENCH_r{r:02d}.json").write_text(
                json.dumps({"calib_sec": calib, "queries": {}})
            )
        monkeypatch.setenv("SPARK_GRAFT_CURRENT_ROUND", "8")
        rec = bench._latest_prior_record(here=str(tmp_path))
        assert rec["calib_sec"] == 0.2  # r7, not the in-progress r8
        monkeypatch.delenv("SPARK_GRAFT_CURRENT_ROUND")
        rec = bench._latest_prior_record(here=str(tmp_path))
        assert rec["calib_sec"] == 0.9  # unset env -> latest on disk

    def test_unwraps_driver_parsed_envelope(self, tmp_path):
        (tmp_path / "BENCH_r5.json").write_text(
            json.dumps({"parsed": {"calib_sec": 0.5, "queries": {}}, "raw": "x"})
        )
        assert bench._latest_prior_record(here=str(tmp_path))["calib_sec"] == 0.5

    def test_none_when_no_records(self, tmp_path):
        assert bench._latest_prior_record(here=str(tmp_path)) is None

    def test_null_parsed_falls_back_to_prior_round(self, tmp_path):
        # the r9 driver record shipped {"parsed": null, "tail": ...}
        # (truncated bench line) — the loader must walk back to the
        # newest USABLE record instead of silently disabling drift
        (tmp_path / "BENCH_r8.json").write_text(
            json.dumps({"calib_sec": 0.4, "queries": {"q": 1.0}})
        )
        (tmp_path / "BENCH_r9.json").write_text(
            json.dumps({"parsed": None, "tail": "fragment", "rc": 0})
        )
        rec = bench._latest_prior_record(here=str(tmp_path))
        assert rec["calib_sec"] == 0.4


class TestDriftFlags:
    def test_subsecond_raw_doubling_flags_raw_mode(self):
        # cramers_v class: 0.45 -> 0.95 s raw (>=2x) under the 1 s floor
        flags = bench._drift_flags({"q": 0.95}, {"q": 0.45}, 0.3, 0.3)
        assert [(n, m) for n, _, _, m in flags] == [("q", "raw")]

    def test_subsecond_small_move_stays_suppressed(self):
        flags = bench._drift_flags({"q": 0.7}, {"q": 0.5}, 0.3, 0.3)
        assert flags == []

    def test_subsecond_halving_flags_raw_mode(self):
        flags = bench._drift_flags({"q": 0.2}, {"q": 0.6}, 0.3, 0.3)
        assert [(n, m) for n, _, _, m in flags] == [("q", "raw")]

    def test_units_rule_requires_same_direction(self):
        # raw +40% but calib also grew 2x -> units SHRANK: opposite
        # directions = calib-sample artifact, suppressed
        assert bench._drift_flags({"q": 2.8}, {"q": 2.0}, 0.3, 0.9) == []
        # raw +40% at matched calib -> units +40%: flagged as 'units'
        flags = bench._drift_flags({"q": 2.8}, {"q": 2.0}, 0.3, 0.3)
        assert [(n, m) for n, _, _, m in flags] == [("q", "units")]

    def test_unknown_and_zero_prior_queries_skipped(self):
        assert bench._drift_flags({"new": 5.0}, {"old": 1.0}, 0.3, 0.3) == []
        assert bench._drift_flags({"q": 5.0}, {"q": 0.0}, 0.3, 0.3) == []


class TestScaleFlags:
    def test_small_baseline_any_shrink_flags(self):
        q = {"f": {"sf0.1": {"sec": 1, "rows": 5}, "sf5": {"sec": 2, "rows": 2}}}
        assert "row-count collapse" in compute_flags(q)["f"]

    def test_small_baseline_stable_ok(self):
        q = {"f": {"sf0.1": {"sec": 1, "rows": 4}, "sf5": {"sec": 2, "rows": 4}}}
        assert compute_flags(q) == {}

    def test_big_baseline_needs_halving(self):
        q = {"f": {"sf0.1": {"sec": 1, "rows": 100}, "sf5": {"sec": 2, "rows": 60}}}
        assert compute_flags(q) == {}
        q["f"]["sf5"]["rows"] = 40
        assert "row-count collapse" in compute_flags(q)["f"]

    def test_empty_flags_unless_allowlisted(self, monkeypatch):
        q = {"f": {"sf0.1": {"sec": 1, "rows": 0}}}
        assert "empty output" in compute_flags(q)["f"]
        import tools.scale_bench_waves as sbw

        monkeypatch.setitem(sbw.ALLOW_EMPTY, "f", "test reason")
        assert compute_flags(q) == {}


class TestSoloVerdict:
    def test_units_inflated_by_calib_crash_is_noise(self):
        # pagerank r8: solo raw 4.317 vs prev 5.496 (DOWN) while units
        # tripled on a 0.077 solo calib -> noise
        assert bench._solo_verdict("units", 4.317, 56.1, 5.496, 18.6) == "noise"

    def test_same_direction_movement_reproduces(self):
        # conformal r8: solo raw 1.103 vs prev 0.596 (+85%) AND units up
        assert bench._solo_verdict("units", 1.103, 14.8, 0.596, 2.0) == "reproduced"

    def test_raw_mode_compares_raw_only(self):
        assert bench._solo_verdict("raw", 0.52, 9.9, 0.50, 1.0) == "noise"
        assert bench._solo_verdict("raw", 1.2, 1.0, 0.5, 9.0) == "reproduced"

    def test_r10_judge_pmi_case_is_noise(self):
        """VERDICT r10 ask #4's synthetic: pmi solo RAW 1.53 s sat at
        its r8 record (1.41 s, prev calib ~0.41 -> prev_u 3.44) while
        a crashed 0.067 solo calib inflated solo units to 22.8 — the
        same-direction rule must adjudicate to noise."""
        solo_sec, solo_calib = 1.53, 0.067
        prev_raw, prev_calib = 1.41, 0.41
        v = bench._solo_verdict(
            "units", solo_sec, solo_sec / solo_calib, prev_raw, prev_raw / prev_calib
        )
        assert v == "noise"


class TestCompactRecord:
    """VERDICT r10 ask #2: the stdout record must survive the
    driver's ~2000-char capture window with 51+ queries."""

    def _record(self, n_queries=51, n_drift=0, n_failed=0, reproduced=0):
        # 22-char names = the real headliner average
        q = {f"typical_query_name_{i:03d}": 12.345 for i in range(n_queries)}
        rec = {
            "metric": "headline_queries_total",
            "value": sum(q.values()),
            "unit": "sec",
            "queries": q,
            "sf": 0.1,
            "calib_sec": 0.201,
        }
        if n_drift:
            names = list(q)[:n_drift]
            rec["drift"] = {
                n: {
                    "prev_units": 1.0,
                    "units": 2.0,
                    "solo_units": 2.0,
                    "solo_sec": 1.0,
                    "solo_calib_sec": 0.2,
                    "flag_mode": "units",
                    "verdict": "reproduced" if i < reproduced else "noise",
                }
                for i, n in enumerate(names)
            }
        if n_failed:
            rec["failed"] = {
                f"failing_query_{i}": "SomeError: " + "x" * 250 for i in range(n_failed)
            }
        return rec

    def test_base_record_under_limit(self):
        out = bench._compact_record(self._record())
        assert len(json.dumps(out, separators=(",", ":"))) <= 1900
        assert len(out["queries"]) == 51
        assert out["calib_sec"] == 0.201

    def test_worst_case_drift_and_failures_still_fit(self):
        rec = self._record(n_drift=51, n_failed=20, reproduced=51)
        out = bench._compact_record(rec)
        assert len(json.dumps(out, separators=(",", ":"))) <= 1900
        # the queries+calib core (what _latest_prior_record needs)
        # survives intact at the realistic scale
        assert len(out["queries"]) == 51
        assert out["calib_sec"] == 0.201

    def test_oversized_headliner_list_degrades_not_truncates(self):
        """If the headliner list ever outgrows the window, the line
        must STAY parseable (shedding queries, recording how many) —
        never the r9/r10 parsed:null failure mode."""
        out = bench._compact_record(self._record(n_queries=120))
        line = json.dumps(out, separators=(",", ":"))
        assert len(line) <= 1900
        assert json.loads(line)["calib_sec"] == 0.201
        assert out["q_omitted"] == 120 - len(out["queries"])
        assert len(out["queries"]) >= 1

    def test_headliner_cap_policy(self):
        """Round-12 policy (VERDICT r11 ask #7): the headliner list is
        capped at 56 — a regression harness, not a coverage ledger.
        Past the cap, a new shape must REPLACE an existing
        representative (see bench.py docstring), so the worst-case
        drift+failure record never needs the shedding fallback."""
        assert len(bench.HEADLINE) <= 56, (
            f"{len(bench.HEADLINE)} headliners — replace a same-class "
            "representative instead of appending (bench.py policy)"
        )
        # worst-case record AT the cap still fits without shedding
        rec = self._record(n_queries=56, n_drift=56, n_failed=20, reproduced=56)
        out = bench._compact_record(rec)
        assert len(json.dumps(out, separators=(",", ":"))) <= 1900
        assert "q_omitted" not in out

    def test_drift_collapses_to_verdict_summary(self):
        out = bench._compact_record(self._record(n_drift=5, reproduced=2))
        assert out["drift"]["noise_n"] == 3
        assert len([n for n in out["drift"]["reproduced"] if "more" not in n]) >= 2

    def test_loader_accepts_compact_record(self, tmp_path):
        out = bench._compact_record(self._record(n_drift=3))
        (tmp_path / "BENCH_r11.json").write_text(
            json.dumps({"parsed": out, "tail": ""})
        )
        rec = bench._latest_prior_record(here=str(tmp_path))
        assert rec is not None and rec["calib_sec"] == 0.201
        assert len(rec["queries"]) == 51


class TestWarmPreamble:
    """r8 verdict ask #5: the solo-measure preamble, unit-tested with
    an injected clock/runner (no SparkSession)."""

    def _fake_clock(self, step=10.0):
        state = {"t": 0.0}

        def clock():
            state["t"] += step
            return state["t"]

        return clock

    def test_runs_until_min_sec(self):
        ran = []
        pre = bench._warm_preamble(
            None,
            "sf",
            min_sec=100.0,
            queries=["a", "b", "c"],
            run=lambda s, d, n: ran.append(n),
            clock=self._fake_clock(step=10.0),
        )
        # clock advances 10 per call; the loop keeps cycling the query
        # list until >= 100 elapsed
        assert pre >= 100.0
        assert len(ran) >= 3 and ran[:3] == ["a", "b", "c"]

    def test_all_failing_queries_do_not_spin_forever(self):
        def boom(s, d, n):
            raise RuntimeError("x")

        pre = bench._warm_preamble(
            None,
            "sf",
            min_sec=1e9,
            queries=["a", "b"],
            run=boom,
            clock=self._fake_clock(step=1.0),
        )
        assert pre < 1e9  # bailed out after one all-failed cycle

    def test_zero_min_sec_is_noop(self):
        ran = []
        pre = bench._warm_preamble(
            None,
            "sf",
            min_sec=0.0,
            queries=["a"],
            run=lambda s, d, n: ran.append(n),
            clock=self._fake_clock(step=1.0),
        )
        assert ran == [] and pre >= 0
