"""sf1-canary cross-round ratio-trend contract (round-7, VERDICT r06 #6).

A single canary run judges each query's sf1/sf0.1 ratio against a fixed
in-round threshold (30x); the slow boil — a ratio creeping 8 → 11 → 15
across rounds while staying under 30 — was invisible. The canary now
persists per-query best (minimum) ratios to docs/CANARY_RATIOS.json and
flags any query whose current ratio exceeds its committed best by >1.25x.
These tests pin the rule and the clobber-proof merge without a Spark run.
"""

from __future__ import annotations

import importlib.util
import json
import os

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "sf1_canary.py",
)
_spec = importlib.util.spec_from_file_location("sf1_canary", _SCRIPT)
canary = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(canary)


def test_ratio_creep_rule():
    prev = {"a": 8.0, "b": 8.0, "gone": 5.0, "tiny": 0.9}
    cur = {"a": 9.9, "b": 10.1, "new": 29.0, "tiny": 1.4}
    creep = canary.find_ratio_creep(prev, cur)
    by_q = {c["q"]: c for c in creep}
    assert "a" not in by_q  # 9.9 <= 8.0 * 1.25 — inside the band
    assert by_q["b"]["now"] == 10.1  # > 1.25x best AND >= floor — flagged
    assert "new" not in by_q  # no baseline yet — recorded, not flagged
    # constant-overhead jitter below the absolute floor never flags even
    # at >1.5x its best (the 60/307 noise-flag lesson from the first run)
    assert "tiny" not in by_q


def test_best_ratio_merge_is_running_minimum():
    prev = {"a": 8.0, "b": 3.0}
    cur = {"a": 12.0, "b": 2.5, "c": 7.0}
    best = canary.merge_best_ratios(prev, cur)
    assert best == {"a": 8.0, "b": 2.5, "c": 7.0}


def test_load_prev_ratios_rejects_other_copy_factor(tmp_path):
    p = tmp_path / "CANARY_RATIOS.json"
    p.write_text(json.dumps({"copies": 5, "best_ratio": {"a": 1.0}}))
    assert canary.load_prev_ratios(str(p)) == {}
    p.write_text(
        json.dumps({"copies": canary.COPIES, "best_ratio": {"a": 1.0, "x": "bad"}})
    )
    assert canary.load_prev_ratios(str(p)) == {"a": 1.0}  # non-numeric dropped


def test_ratio_sidecar_is_committed_and_covers_registry():
    """The sidecar is the trend baseline — it must be committed and carry a
    best ratio for (at least) every canary-listed heavy query."""
    with open(canary.RATIO_SIDECAR) as fh:
        side = json.load(fh)
    assert side["copies"] == canary.COPIES
    best = side["best_ratio"]
    assert len(best) >= 250  # seeded from the r05+r06 full sweeps
    assert all(isinstance(v, (int, float)) and v > 0 for v in best.values())


def test_sf10_canary_names_are_registered():
    """scripts/sf10_canary.py (r11): every scale-sensitive query it
    measures must exist in the registry, and none may be parity_only
    (perf-surface exclusion rule)."""
    import scripts.sf10_canary as sf10

    from hive_apache_ci_spark.registry import all_queries, parity_only_queries

    qs = all_queries()
    for name in sf10.SF10_QUERIES:
        assert name in qs, name
    assert not (set(sf10.SF10_QUERIES) & parity_only_queries())
    assert sf10.COPIES == 100  # one decade over the sf1 canary
