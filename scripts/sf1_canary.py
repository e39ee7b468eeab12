#!/usr/bin/env python
"""sf1 scaling canary (round-4, VERDICT item 4): measure sf0.1 → sf1 wall
time for the heaviest queries and flag super-linear blowups EMPIRICALLY
instead of asserting 100x-safety from plan shape alone.

Generates a local "sf1" (10x sf0.1: 6M-row lineitem, 50k docs, 20k
vectors, 1M events) into /tmp/hive_apache_ci_spark_sf1 by deterministic
replication with DuckDB:

- TPC-H tables: 10 copies with key offsets (o_orderkey/o_custkey/... keep
  join integrity; nation/region stay fixed dimensions);
- documents: each copy applies a VOCABULARY BIJECTION — every token gets
  a copy-unique suffix, 'x' + copy-id since r12 (the r11 ADVICE caught
  that the old 'c' + id suffix could collide with an original token
  shaped like 'abc1'. First fix attempt used '§', which is outside any
  ASCII vocabulary — but it is MULTI-BYTE in UTF-8 and broke the two
  oracles that rely on the corpus being pure ASCII for byte-vs-char
  slicing equivalence (multimodal_chunk_bytes, search_spell_correction:
  464/466 at the first r12 sf1 sweep). The generator's charset is
  exactly ' a-y' minus 'x' — no digits, no 'x' — so 'x'+digits can never
  equal an original token; generate() asserts that charset before
  writing and fails loudly if the upstream testdata generator ever
  changes).
  (r11. History: a prepended tag left copies at
  Jaccard ~0.99, so shingle-LSH caught every cross-copy pair and output
  grew QUADRATICALLY in copies — the sf10 canary measured 1.09e9 pairs,
  a 99x output blow-up; a marker interleaved every 3 tokens only got
  cross-copy J down to ~0.47, which 2-row/8-band LSH still catches 86%
  of the time. Renaming the vocabulary per copy makes cross-copy J
  EXACTLY 0 while every within-copy planted near-dup pair keeps its
  original Jaccard exactly — the same disjoint-blocks discipline as the
  customer names, with zero banding-curve dependence);
- embeddings: each copy is a cyclic rotation of the vector (norms and
  pairwise-distance distribution preserved, no artificial duplicate pairs);
- events: user_id offset per copy (sessions/windows scale linearly).

Usage: python scripts/sf1_canary.py [--regen]  → one JSON line with
{query: {sf01, sf1, ratio}} and a linearity verdict per query (data is
10x, so ratio ≈ 10 is linear; > 30 ⇒ super-linear flag, recorded in
docs/BENCH_TREND.md).

Round-6 (r5 VERDICT #4): every attempt runs under a wall-clock ceiling
(TIMEOUT_S per SF; override with --timeout-sf1 N). The r5 canary caught
join_fuzzy_blocked's single-task Levenshtein serialization only because a
human watched it hang; now the attempt's Spark job group is cancelled at
the ceiling and the query is recorded with verdict TIMEOUT — the canary
self-terminates with a named culprit.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

SF01 = "/root/testdata/sf0.1"
SF1_DIR = "/tmp/hive_apache_ci_spark_sf1"
COPIES = 10

# Round-7 (r6 verdict #6): cross-round ratio trend. A single round's
# verdict ("ratio <= 30") can't see the slow boil — a query whose
# sf1/sf0.1 ratio creeps from 8 to 11 to 15 across rounds is going
# super-linear without ever tripping the in-round flag. The sidecar keeps
# each query's best (minimum) observed ratio, the run's output carries
# `ratio_creep` for any query whose current ratio exceeds its committed
# best by >CREEP_RATIO, and the sidecar merge is a running minimum (the
# BENCH_LAST.json clobber-proof rule: one noisy run must not erase the
# trend baseline).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RATIO_SIDECAR = os.path.join(_REPO, "docs", "CANARY_RATIOS.json")
CREEP_RATIO = 1.25
# Creep only matters when the ratio is drifting TOWARD super-linear
# territory: with the baseline a cross-round running MINIMUM, a
# constant-overhead query jitters 0.9 -> 1.2 and trips a bare 1.25x rule
# (first full run flagged 60/307 queries, ~all low-absolute noise). A
# ratio under this floor is constant-dominated at 10x data — not a
# scaling signal at all.
CREEP_MIN_RATIO = 3.0


def load_prev_ratios(path: str = RATIO_SIDECAR) -> dict[str, float]:
    try:
        with open(path) as fh:
            prev = json.load(fh)
        if prev.get("copies") != COPIES:
            return {}  # ratios from a different replication factor
        return {
            k: v for k, v in (prev.get("best_ratio") or {}).items()
            if isinstance(v, (int, float))
        }
    except (OSError, ValueError):
        return {}


def find_ratio_creep(
    prev_best: dict[str, float], ratios: dict[str, float]
) -> list[dict]:
    """Queries whose current sf1/sf0.1 ratio exceeds their committed best
    ratio by >CREEP_RATIO AND sits above CREEP_MIN_RATIO — the cross-round
    super-linearity drift rule, floored so constant-overhead jitter on
    sub-linear ratios never flags."""
    out = []
    for name, now in ratios.items():
        prev = prev_best.get(name)
        if (
            prev is not None
            and now > prev * CREEP_RATIO
            and now >= CREEP_MIN_RATIO
        ):
            out.append({"q": name, "best": prev, "now": now})
    return out


def merge_best_ratios(
    prev_best: dict[str, float], ratios: dict[str, float]
) -> dict[str, float]:
    best = dict(prev_best)
    for k, v in ratios.items():
        best[k] = min(v, best[k]) if k in best else v
    return best

# Per-attempt wall-clock ceilings. The slowest healthy sf1 query in the r5
# full sweep ran ~25 s; 120 s is ~5x headroom, while the bug class this
# guards against (work serialized into one task) runs for many minutes.
TIMEOUT_S = {"sf01": 60.0, "sf1": 120.0}

# the heaviest registry queries (bench + round-3 trend), spanning every
# expensive topology: scan-agg, star join, window, session, minhash,
# hyperplane LSH, brute-force knn, iterative CC, retrieval, merge
CANARY_QUERIES = [
    "q1_pricing_summary",
    "join_broadcast_star",
    "tpch_q5_local_supplier",
    "window_moving_rows",
    "events_session_window",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "knn_topk_cosine",
    "quality_lm_perplexity",
    "search_bm25_topk",
    "merge_into_upsert",
    "dedup_connected_components",
    # round-4 heavy additions: iterative trainers + segment/winnow text
    # passes + composed ANN search
    "kmeans_lloyd",
    "train_logreg_quality",
    "dedup_repeated_segments",
    "text_winnow_fingerprints",
    "dedup_semdedup_clusters",
    "ivf_pq_topk",
    "bpe_encode_corpus",
]


def _assert_bijection_marker_safe(con, docs_rel: str = "documents") -> None:
    """The vocabulary bijection's collision-freedom AND the engine's two
    byte-slicing oracles both rest on the corpus charset: pure ASCII with
    no 'x' and no digits. Assert it at generation time so an upstream
    testdata-generator change fails HERE, loudly, instead of surfacing as
    a mysterious sweep mismatch (r12: the interim '§' marker broke
    multimodal_chunk_bytes/search_spell_correction byte-vs-char oracle
    equivalence — 464/466 — before this guard existed)."""
    n = con.execute(
        f"SELECT count(*) FROM {docs_rel} "
        "WHERE regexp_matches(text, '[x0-9]') "
        "   OR regexp_matches(text, '[^ -~]')"
    ).fetchone()[0]
    if n:
        raise AssertionError(
            f"{n} document(s) contain 'x', a digit, or non-ASCII — the "
            "'x'+copy-id bijection marker is no longer collision-safe; "
            "pick a marker outside the new charset"
        )


def generate(force: bool = False) -> None:
    marker = os.path.join(SF1_DIR, ".complete")
    if os.path.exists(marker) and not force:
        return
    import duckdb

    shutil.rmtree(SF1_DIR, ignore_errors=True)
    os.makedirs(SF1_DIR, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "lineitem orders customer supplier part events documents embeddings "
        "region nation".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF01}/{t}.parquet'")
    _assert_bijection_marker_safe(con)

    def copy_out(name: str, select_sql: str) -> None:
        con.execute(
            f"COPY ({select_sql}) TO '{SF1_DIR}/{name}.parquet'"
            " (FORMAT PARQUET)"
        )

    # key strides (max+1 per copy keeps keys disjoint and joins consistent)
    ok, ck, sk, pk = [
        con.execute(f"SELECT max({c}) + 1 FROM {t}").fetchone()[0]
        for c, t in [
            ("o_orderkey", "orders"),
            ("c_custkey", "customer"),
            ("s_suppkey", "supplier"),
            ("p_partkey", "part"),
        ]
    ]
    copy_out(
        "lineitem",
        f"""SELECT l_orderkey + i*{ok} AS l_orderkey,
                   l_partkey + i*{pk} AS l_partkey,
                   l_suppkey + i*{sk} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem, range({COPIES}) r(i)""",
    )
    copy_out(
        "orders",
        f"""SELECT o_orderkey + i*{ok} AS o_orderkey,
                   o_custkey + i*{ck} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders, range({COPIES}) r(i)""",
    )
    # c_name: each copy swaps the '#' separator for a copy-specific letter
    # (same length, same position). Identical names across copies would
    # multiply fuzzy-join block sizes by COPIES and make every cross-copy
    # pair a Levenshtein-0 match — measuring the replication artifact, not
    # the engine (the same reason documents get a copy tag). Changing one
    # char INSIDE the 15-char blocking prefix keeps each copy's block
    # structure identical to the original while routing copies to disjoint
    # blocks, so candidate volume scales exactly linearly. (A prefix or
    # suffix tag fails both ways: a prefix eats the discriminating digits
    # and collapses a whole copy into one block; a suffix leaves all
    # copies sharing blocks 10x bigger.)
    copy_out(
        "customer",
        f"""SELECT c_custkey + i*{ck} AS c_custkey,
                   CASE WHEN i = 0 THEN c_name
                        ELSE replace(c_name, '#', chr(CAST(64 + i AS INTEGER))) END AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM customer, range({COPIES}) r(i)""",
    )
    copy_out(
        "supplier",
        f"""SELECT s_suppkey + i*{sk} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM supplier, range({COPIES}) r(i)""",
    )
    copy_out(
        "part",
        f"""SELECT p_partkey + i*{pk} AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM part, range({COPIES}) r(i)""",
    )
    for t in ("region", "nation"):
        copy_out(t, f"SELECT * FROM {t}")
    ek, uk, dk, vk = [
        con.execute(f"SELECT max({c}) + 1 FROM {t}").fetchone()[0]
        for c, t in [
            ("event_id", "events"),
            ("user_id", "events"),
            ("doc_id", "documents"),
            ("vec_id", "embeddings"),
        ]
    ]
    copy_out(
        "events",
        f"""SELECT event_id + i*{ek} AS event_id, ts,
                   user_id + i*{uk} AS user_id, event_type, value, props
            FROM events, range({COPIES}) r(i)""",
    )
    copy_out(
        "documents",
        f"""SELECT doc_id + i*{dk} AS doc_id, txt AS text, lang, source,
                   length(txt) AS n_chars
            FROM (
              SELECT doc_id, lang, source, i,
                     CASE WHEN i = 0 THEN text
                          ELSE regexp_replace(text, '(\\S+)',
                                              '\\1x' || i, 'g') END AS txt
              FROM documents, range({COPIES}) r(i)
            )""",
    )
    copy_out(
        "embeddings",
        f"""SELECT vec_id + i*{vk} AS vec_id,
                   CASE WHEN i = 0 THEN embedding
                        ELSE embedding[i+1:] || embedding[1:i] END AS embedding,
                   label
            FROM embeddings, range({COPIES}) r(i)""",
    )
    with open(marker, "w") as fh:
        fh.write("ok")


class Timeout(Exception):
    pass


def _count_with_ceiling(spark, fn, sf_dir: str, limit_s: float, group: str) -> int:
    """fn(spark, sf_dir).count() with a wall-clock ceiling: the count runs
    in a worker thread under its own Spark job group (job groups are
    thread-local, so the group must be set IN the worker); at the ceiling
    the main thread cancels the group (interruptOnCancel=True) and raises
    Timeout. The cancelled worker dies on its own py4j error shortly after
    — daemon=True means a stuck one can't block interpreter exit."""
    box: dict = {}

    def target():
        try:
            spark.sparkContext.setJobGroup(group, "canary ceiling", True)
            box["rows"] = fn(spark, sf_dir).count()
        except BaseException as exc:  # noqa: BLE001 — relayed to caller
            box["exc"] = exc

    th = threading.Thread(target=target, daemon=True)
    th.start()
    th.join(limit_s)
    if th.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        th.join(15)
        raise Timeout(f"exceeded {limit_s:.0f}s ceiling")
    if "exc" in box:
        raise box["exc"]
    return box["rows"]


def main() -> int:
    force = "--regen" in sys.argv
    # --all (round-5, VERDICT item 5): sweep the ENTIRE registry at sf0.1
    # and sf1 with one timed run each — the cheapest structural check for
    # the next vacuity/blowup class. The default mode keeps best-of-2 warm
    # timing for the heavy set (trend-grade numbers); --all trades timing
    # precision for coverage (the flag threshold is 30x, far above noise).
    all_mode = "--all" in sys.argv
    generate(force)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from hive_apache_ci_spark.registry import all_queries
    from hive_apache_ci_spark.session import get_spark

    spark = get_spark("sf1-canary")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    # Parse --timeout-sf1 ONCE, stripping every occurrence (flag + value)
    # from the positional list; a missing value is a usage error, not an
    # IndexError mid-sweep.
    argv = sys.argv[1:]
    timeout_sf1 = None
    while "--timeout-sf1" in argv:
        i = argv.index("--timeout-sf1")
        if i + 1 >= len(argv):
            print("usage: --timeout-sf1 <seconds>", file=sys.stderr)
            return 2
        timeout_sf1 = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    # positional names (optional) restrict the sweep — resume/spot-check
    explicit = [a for a in argv if not a.startswith("--")]
    if explicit:
        names = explicit
    elif all_mode:
        # parity-only shapes (registry flag, r10) are correctness-surface
        # only: their plans are the documented don't-ship-at-scale twins,
        # so timing them would grade a plan the repo tells you not to run.
        # Named here, not silently dropped.
        from hive_apache_ci_spark.registry import parity_only_queries

        parity = parity_only_queries()
        names = sorted(set(qs.keys()) - parity)
        if parity:
            print(
                f"canary: excluding parity-only shapes: {sorted(parity)}",
                file=sys.stderr,
            )
    else:
        names = CANARY_QUERIES
    timeouts = dict(TIMEOUT_S)
    if timeout_sf1 is not None:
        timeouts["sf1"] = timeout_sf1
    out: dict[str, dict] = {}
    for name in names:
        row: dict = {}
        for tag, sf_dir in [("sf01", SF01), ("sf1", SF1_DIR)]:
            limit = timeouts[tag]
            try:
                if not all_mode:
                    # warm: plan + page cache (ceiling applies here too —
                    # the r5 hang WAS the warm-up run)
                    _count_with_ceiling(
                        spark, qs[name], sf_dir, limit, f"{name}@{tag}#warm"
                    )
                reps = 1 if all_mode else 2
                best = float("inf")
                for i in range(reps):
                    t0 = time.perf_counter()
                    n_rows = _count_with_ceiling(
                        spark, qs[name], sf_dir, limit, f"{name}@{tag}#{i}"
                    )
                    best = min(best, time.perf_counter() - t0)
                row[tag] = round(best, 3)
                row[f"rows_{tag}"] = n_rows
            except Timeout as exc:
                print(f"canary: {name}@{tag} TIMEOUT: {exc}", file=sys.stderr)
                row[tag] = None
                row["verdict"] = "TIMEOUT"
            except Exception as exc:  # noqa: BLE001
                print(f"canary: {name}@{tag} FAILED: {exc}", file=sys.stderr)
                row[tag] = None
        if row.get("sf01") and row.get("sf1"):
            row["ratio"] = round(row["sf1"] / row["sf01"], 1)
            # 10x data: <= 3x headroom over linear before we call it
            # super-linear (constant overheads make small ratios noisy)
            row["verdict"] = "linear-ish" if row["ratio"] <= 30 else "SUPER-LINEAR"
            # vacuity companion: a query non-empty at sf0.1 but EMPTY at
            # sf1 is the market_basket_lift failure class at one more SF
            if row.get("rows_sf01", 0) > 0 and row.get("rows_sf1") == 0:
                row["verdict"] = "VACUOUS-AT-SF1"
        out[name] = row
        print(f"  {name}: {row}", file=sys.stderr)
    ratios = {
        k: r["ratio"] for k, r in out.items() if r.get("ratio") is not None
    }
    prev_best = load_prev_ratios()
    creep = find_ratio_creep(prev_best, ratios)
    for c in creep:
        print(
            f"canary: RATIO-CREEP {c['q']}: best {c['best']} -> now {c['now']}"
            f" (> {CREEP_RATIO}x)",
            file=sys.stderr,
        )
    # Persist the trend baseline (best-effort; full sweeps only overwrite
    # entries they measured — a spot-check run must not shrink the sidecar)
    try:
        os.makedirs(os.path.dirname(RATIO_SIDECAR), exist_ok=True)
        # r11 fix: the merge-don't-shrink rule applies to EVERY field, not
        # just best_ratio — a spot-check run used to clobber last_ratio
        # down to the measured subset and drop extra keys (e.g. the r10
        # `rebased` annotation). Read the previous sidecar verbatim and
        # overwrite only what this run measured.
        try:
            with open(RATIO_SIDECAR) as fh:
                sidecar = json.load(fh)
        except (OSError, ValueError):
            sidecar = {}
        if sidecar.get("copies") not in (None, COPIES):
            sidecar = {}  # different replication factor: start fresh
        sidecar["copies"] = COPIES
        sidecar["best_ratio"] = merge_best_ratios(prev_best, ratios)
        sidecar["last_ratio"] = {
            **(sidecar.get("last_ratio") or {}), **ratios
        }
        sidecar["creep_rule"] = f">{CREEP_RATIO}x best"
        with open(RATIO_SIDECAR, "w") as fh:
            json.dump(sidecar, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:
        print(f"canary: ratio sidecar write failed: {exc}", file=sys.stderr)
    print(
        json.dumps(
            {
                "copies": COPIES,
                "all": all_mode,
                "queries": out,
                "ratio_creep": [c["q"] for c in creep],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
