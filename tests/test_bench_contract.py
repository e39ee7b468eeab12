"""bench.py driver-contract tests (round-6, VERDICT r05 item #1).

Round 5's grade came back `parsed: null`: the one-line JSON payload outgrew
the driver's fixed-size stdout tail capture. The contract is now explicit —
the LAST stdout line is a compact JSON grade under 2 KB; everything bulky
(spread, regression detail) lives in the docs/BENCH_LAST.json sidecar.
These tests pin that contract without paying for a real bench run.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _fake_timings(n: int) -> dict[str, float]:
    # worst realistic case: more queries than we actually bench, long names
    return {f"some_quite_long_query_name_number_{i:02d}": 123.4567 for i in range(n)}


def test_compact_line_parses_and_fits_tail_window():
    timings = _fake_timings(30)
    regs = [{"q": k, "prev": 1.0, "now": 2.0} for k in list(timings)[:5]]
    line = bench.compact_line(370.37, timings, 0.1, False, regs)
    assert len(line) < 2048, len(line)
    parsed = json.loads(line)
    assert parsed["value"] == 370.37
    assert parsed["unit"] == "sec"
    assert set(parsed["regressions"]) == set(list(timings)[:5])
    # spread must NOT be in the grade line — that's what overflowed r5
    assert "spread" not in parsed


def test_compact_line_degrades_to_core_queries_rather_than_overflow():
    # pathological: hundreds of queries would overflow — the line must slim
    # itself to the three baseline-comparable queries, never exceed the cap
    timings = _fake_timings(200)
    for name in bench.BASELINE_COMPARABLE:
        timings[name] = 0.5
    line = bench.compact_line(1.5, timings, 0.1, True, [])
    assert len(line) < 2048, len(line)
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(bench.BASELINE_COMPARABLE)


def test_find_regressions_rule():
    prev = {"a": 1.0, "b": 1.0, "c": 1.0, "gone": 9.9}
    cur = {"a": 1.14, "b": 1.16, "c": None, "new": 5.0}
    regs = bench.find_regressions(prev, cur)
    by_q = {r["q"]: r for r in regs}
    assert "a" not in by_q  # inside the 15% band
    assert by_q["b"]["now"] == 1.16  # >15% slower
    assert by_q["c"]["now"] == "failed"  # crash = worst regression
    assert "new" not in by_q  # no previous best to compare against


def test_bench_names_are_registered():
    from hive_apache_ci_spark.registry import all_queries

    names = set(all_queries())
    for q in (*bench.BASELINE_COMPARABLE, *bench.EXTRA_HEADLINERS):
        assert q in names, q


def test_sidecar_is_committed_and_loadable():
    # the sidecar doubles as the next round's regression baseline — it must
    # exist in the repo and carry per-query bests
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "BENCH_LAST.json",
    )
    with open(path) as fh:
        prev = json.load(fh)
    assert prev["queries"], "sidecar lost its per-query bests"
    assert all(v is None or v > 0 for v in prev["queries"].values())


def test_regression_baseline_is_running_minimum(tmp_path, monkeypatch):
    """A slow run must not clobber the committed bests (the review-caught
    contract gap: a persistent regression would be reported once and then
    silently pass), and a crashed query must not erase its best."""
    import json

    side = tmp_path / "BENCH_LAST.json"
    monkeypatch.setattr(bench, "_SIDECAR", str(side))
    side.write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 9.9}, "best": {"a": 1.0, "b": 2.0}})
    )
    prev = bench._load_prev_best(0.1)
    assert prev == {"a": 1.0, "b": 2.0}  # `best` wins over `queries`
    # simulate the merge rule from main(): slow run + crash
    timings = {"a": 3.0, "b": None, "c": 0.5}
    best = dict(prev)
    for k, v in timings.items():
        if v is not None:
            best[k] = min(v, best[k]) if k in best else v
    assert best == {"a": 1.0, "b": 2.0, "c": 0.5}


def test_compact_line_carries_converged_story_and_still_fits():
    """Round-7 (r6 verdict #2): the grade line must carry noisy/best_total
    so the driver's artifact references converged numbers even on a loaded
    box — and adding them must not break the 2 KB tail contract."""
    timings = _fake_timings(30)
    line = bench.compact_line(370.37, timings, 0.1, False, [], True, 1.519)
    assert len(line) < 2048, len(line)
    parsed = json.loads(line)
    assert parsed["noisy"] is True
    assert parsed["best_total"] == 1.519
    # default: a clean run is explicitly not-noisy (absence is ambiguous)
    parsed = json.loads(bench.compact_line(1.5, timings, 0.1, False, []))
    assert parsed["noisy"] is False and parsed["best_total"] is None


def test_trio_total_requires_all_three():
    t = {n: 0.5 for n in bench.BASELINE_COMPARABLE}
    assert bench._trio_total(t) == 1.5
    t[bench.BASELINE_COMPARABLE[0]] = None
    assert bench._trio_total(t) is None  # a crashed trio query -> no total


def test_measure_merges_running_minima():
    """The auto-rerun merges via minima — a rerun can only improve a
    number, never clobber a faster first pass."""

    class _FakeDF:
        def __init__(self, delay):
            self.delay = delay

        def collect(self):
            pass

    calls = {"n": 0}

    def fake_query(spark, sf_dir):
        calls["n"] += 1
        return _FakeDF(0)

    timings = {"q": 0.0}  # pre-existing unbeatable result
    spread = {"q": {"best": 0.0, "median": 0.0, "worst": 0.0}}
    bench._measure(None, "x", {"q": fake_query}, ("q",), timings, spread)
    assert timings["q"] == 0.0  # rerun (slower) did not clobber
    assert spread["q"]["best"] == 0.0
    assert calls["n"] >= 2  # cold + warm reps actually ran


def test_parity_only_excluded_from_perf_surfaces():
    """The registry's parity_only flag (r10): the two deliberate
    global-window parity shapes stay in the CORRECTNESS surface but must
    never appear in a performance list — bench headliners or the canary's
    heavy set — and each must have its scaled twin registered."""
    import bench
    from hive_apache_ci_spark.registry import all_queries, parity_only_queries
    from scripts.sf1_canary import CANARY_QUERIES

    parity = parity_only_queries()
    assert parity == {"window_ntile", "window_rfm_segmentation"}
    perf = set(bench.BASELINE_COMPARABLE) | set(bench.EXTRA_HEADLINERS) | set(
        CANARY_QUERIES
    )
    assert not (parity & perf), parity & perf
    qs = all_queries()
    for twin in ("window_ntile_scaled", "window_rfm_scaled"):
        assert twin in qs and twin not in parity


def test_sentinel_normalizer_contract(tmp_path, monkeypatch):
    """r11: the sentinel is the ONE comparator normalizer. Pin the math
    without a Spark session: ratio = mean(start, end)/best, floor 1.0;
    sentinel best is a running minimum; a missing historical best (first
    run) yields ratio vs this run's own min (>= 1.0, ~1.0)."""
    monkeypatch.setattr(bench, "_SIDECAR", str(tmp_path / "BENCH_LAST.json"))
    # first run: no sidecar -> no sentinel best
    assert bench._load_sentinel_best(0.1) == {}
    # bests are PER PHASE (start is JIT-cold, end warm — r11 run-1 measured
    # spark_s 0.159 vs 0.044; pooling would read a permanent fake drift)
    best = {
        "start": {"cpu_s": 0.04, "spark_s": 0.16},
        "end": {"cpu_s": 0.04, "spark_s": 0.045},
    }
    with open(bench._sidecar_path(0.1), "w") as fh:
        json.dump({"sf": 0.1, "sentinel": {"best": best}}, fh)
    assert bench._load_sentinel_best(0.1) == best
    # a slow-box run (1.5x sentinel) scales the comparator: a query at
    # 1.4x its best does NOT flag normalized but DOES flag raw
    prev_best = {"q": 1.0}
    timings = {"q": 1.4}
    ratio = 1.5
    scaled = {k: v * ratio for k, v in prev_best.items()}
    assert bench.find_regressions(scaled, timings) == []
    raw = bench.find_regressions(prev_best, timings)
    assert [r["q"] for r in raw] == ["q"]


def test_sentinel_probe_shape_and_workload_pins():
    """The probe's workload constants are frozen (changing them silently
    invalidates committed sentinel bests)."""
    assert bench._SENT_CPU_BYTES == 1 << 20
    assert bench._SENT_CPU_REPS == 48
    assert bench._SENT_SPARK_ROWS == 4_000_000
