"""Round-6 scratch discipline (r5 VERDICT #2/#7): every write-then-read-back
query must use a per-run path — no fixed shared /tmp write path anywhere —
with _SUCCESS-gated readbacks and stale-run GC."""

from __future__ import annotations

import os
import time

from hive_apache_ci_spark import helpers


def test_run_scratch_is_per_run_and_tagged(tmp_path, monkeypatch):
    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    p = helpers.run_scratch("io", "/root/testdata/sf0.01", "foo")
    assert helpers.RUN_ID in p
    assert p.endswith(os.path.join("sf0.01", helpers.RUN_ID, "foo"))
    assert "hive_apache_ci_spark_io" in p


def test_gc_reaps_only_stale_foreign_runs(tmp_path, monkeypatch):
    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    base = tmp_path / "hive_apache_ci_spark_io" / "sf0.01"
    stale = base / "run-deadbeef0000"
    fresh = base / "run-cafebabe0000"
    ours = base / helpers.RUN_ID
    legacy = base / "orders_by_year"  # pre-round-6 fixed layout: left alone
    for d in (stale, fresh, ours, legacy):
        d.mkdir(parents=True)
    old = time.time() - helpers._STALE_SECONDS - 60
    os.utime(stale, (old, old))
    os.utime(ours, (old, old))  # even an old OWN dir must survive
    helpers.run_scratch("io", "/root/testdata/sf0.01", "foo")
    assert not stale.exists()
    assert fresh.exists() and ours.exists() and legacy.exists()


def test_committed_gates_on_success_marker(tmp_path):
    d = tmp_path / "out"
    d.mkdir()
    try:
        helpers.committed(str(d))
        raise AssertionError("uncommitted dir accepted")
    except OSError:
        pass
    (d / "_SUCCESS").touch()
    assert helpers.committed(str(d)) == str(d)


def test_no_fixed_shared_tmp_write_paths_in_tree():
    """Grep-clean criterion from r5 VERDICT #2: the only /tmp paths allowed
    in source are (a) per-run (RUN_ID/uuid in the path), (b) content-
    addressed with atomic publish (the PQ index, the staged events copy),
    or (c) the session warehouse (per-run table names)."""
    import re

    root = os.path.join(os.path.dirname(os.path.dirname(__file__)), "hive_apache_ci_spark")
    offenders = []
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            src = open(path).read()
            for m in re.finditer(r"gettempdir\(\)|[\"']/tmp[\"']", src):
                line = src[: m.start()].count("\n") + 1
                offenders.append(f"{os.path.relpath(path, root)}:{line}")
    allowed = {
        # helpers.run_scratch — the per-run factory itself
        "helpers.py",
        # _staged_events_dir (content-addressed atomic copy), per-run uuid
        # stream sinks
        "streaming/jobs.py",
        # _pq_index_dir: content-addressed (recipe+mtime key), atomic publish
        "pipeline/similarity.py",
        # warehouse dir for bucketed saveAsTable; table names carry RUN_ID
        "session.py",
    }
    bad = [o for o in offenders if o.rsplit(":", 1)[0] not in allowed]
    assert not bad, f"fixed /tmp write paths outside the audited allowlist: {bad}"


def test_index_gc_never_reaps_inflight_builds(tmp_path):
    """ADVICE r06 (high): two concurrent cold builders — A must not reap
    B's in-progress (_SUCCESS-less) version dir, and the GC must keep
    whatever LATEST names at GC time even if it is not in A's keep set."""
    import os
    import time

    from hive_apache_ci_spark.pipeline.similarity import (
        _PQ_GC_STALE_SECONDS,
        _gc_pq_versions,
    )

    root = str(tmp_path)

    def mkver(name, committed, mtime_ago=0.0):
        d = os.path.join(root, name)
        os.makedirs(d)
        if committed:
            open(os.path.join(d, "_SUCCESS"), "w").close()
        if mtime_ago:
            past = time.time() - mtime_ago
            os.utime(d, (past, past))
        return d

    mkver("v_new", committed=True)          # A's fresh build (in keep)
    mkver("v_prev", committed=True)         # grace generation (in keep)
    mkver("v_inflight", committed=False)    # B's build mid-write
    mkver("v_crashed", committed=False, mtime_ago=_PQ_GC_STALE_SECONDS + 60)
    mkver("v_old", committed=True)          # genuinely old committed
    mkver("v_pointed", committed=True)      # a racing builder's flip...
    with open(os.path.join(root, "LATEST"), "w") as fh:
        fh.write("v_pointed")               # ...LATEST names it, keep it

    _gc_pq_versions(root, {"v_new", "v_prev", None})

    left = {e for e in os.listdir(root) if e.startswith("v_")}
    assert left == {"v_new", "v_prev", "v_inflight", "v_pointed"}, left
