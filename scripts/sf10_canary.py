#!/usr/bin/env python
"""sf10 scaling canary (round-11, r10 VERDICT task 6): raise the measured
scale ceiling ONE MORE DECADE for the scale-sensitive families. The 100 TB
claim previously rested on sf0.1 -> sf1 (10x) ratios alone; this canary
measures sf1 -> sf10 (10x again, 100x the graded correctness scale) for
the dedup ladder, the ANN lifecycle, and the three heaviest joins, and
writes docs/CANARY_sf10.json with per-query {sf1, sf10, ratio, verdict}.

Generation mirrors scripts/sf1_canary.py's replication recipe but reads
FROM sf0.1 WITH 100 COPIES (not from sf1 with 10 — re-replicating sf1
would re-use its copy markers and create cross-copy exact duplicates that
inflate every dedup/fuzzy operator quadratically, measuring the data
artifact instead of the engine):

- TPC-H tables: key offsets per copy keep join integrity;
- customer: the '#' in c_name is swapped for a copy-unique single
  CODEPOINT (chr(192+i), Latin Extended — 99 distinct letters where the
  sf1 recipe's chr(64+i) runs out of printable ASCII at 26 copies); same
  char-length, same position, so per-copy fuzzy-join block structure is
  identical to the original while copies land in disjoint blocks;
- documents: per-copy vocabulary bijection — every token suffixed with
  the copy id (see the sf1_canary docstring: prepended tags and
  interleaved markers both left cross-copy Jaccard above the LSH
  banding curve; renaming the vocabulary makes it exactly 0 while
  within-copy planted near-dup pairs keep their Jaccard exactly);
- embeddings: cyclic rotation by 1 + (i-1) % 63 (distance distribution
  preserved) PLUS a +i*1e-6 perturbation so copies whose rotation amount
  collides (i and i+63) are still not bitwise-equal vectors.

Usage: python scripts/sf10_canary.py [--regen] [names...]
Verdict rule matches sf1_canary: data is 10x, ratio <= 30 is linear-ish,
above is SUPER-LINEAR; every attempt runs under a wall-clock ceiling.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.sf1_canary import (  # noqa: E402 — reuse the sf1 machinery
    SF1_DIR,
    Timeout,
    _count_with_ceiling,
    generate as generate_sf1,
)

SF01 = "/root/testdata/sf0.1"
SF10_DIR = "/tmp/hive_apache_ci_spark_sf10"
COPIES = 100
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(_REPO, "docs", "CANARY_sf10.json")

#: The scale-sensitive families (r10 VERDICT task 6): dedup ladder rungs,
#: the IVF-PQ lifecycle + brute-force kNN baseline, and the three heaviest
#: joins by sf1 wall time in docs/CANARY_r10_full.json.
SF10_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "ivf_pq_build_index",
    "ivf_pq_search_topk",
    "ivf_pq_ingest_delta",
    "knn_topk_cosine",
    "join_fuzzy_blocked",
    "join_salted_skew",
    "join_nullsafe",
    # round-12 widening (r11 VERDICT task 6): the retrieval family, the
    # heaviest TPC-DS shapes by r11 bench wall time, one ACID op at 10x
    # delta volume, and the r12-fixed n-gram shim
    "search_bm25_topk",
    "search_hybrid_rrf_indexed",
    "tpcds_q72_lagged_fulfillment",
    "tpcds_q64_item_year_resales",
    "tpcds_q95_multi_supplier",
    "acid_partitioned_upsert",
    "hive_ngrams_top",
]

TIMEOUT_S = {"sf1": 600.0, "sf10": 1800.0}


def generate(force: bool = False) -> None:
    marker = os.path.join(SF10_DIR, ".complete")
    if os.path.exists(marker) and not force:
        return
    import duckdb

    shutil.rmtree(SF10_DIR, ignore_errors=True)
    os.makedirs(SF10_DIR, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "lineitem orders customer supplier part events documents embeddings "
        "region nation".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF01}/{t}.parquet'")
    from scripts.sf1_canary import _assert_bijection_marker_safe

    _assert_bijection_marker_safe(con)

    def copy_out(name: str, select_sql: str) -> None:
        con.execute(
            f"COPY ({select_sql}) TO '{SF10_DIR}/{name}.parquet'"
            " (FORMAT PARQUET)"
        )

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
    copy_out(
        "customer",
        f"""SELECT c_custkey + i*{ck} AS c_custkey,
                   CASE WHEN i = 0 THEN c_name
                        ELSE replace(c_name, '#',
                                     chr(CAST(192 + i AS INTEGER))) END
                       AS c_name,
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
                        ELSE list_transform(
                               embedding[2 + (i-1) % 63:]
                                 || embedding[1:1 + (i-1) % 63],
                               x -> CAST(x + i * 1e-6 AS FLOAT)) END
                       AS embedding,
                   label
            FROM embeddings, range({COPIES}) r(i)""",
    )
    with open(marker, "w") as fh:
        fh.write("ok")


def main() -> int:
    force = "--regen" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    generate_sf1(False)  # the sf1 baseline side
    generate(force)
    from hive_apache_ci_spark.registry import all_queries
    from hive_apache_ci_spark.session import get_spark

    spark = get_spark("sf10-canary")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out: dict[str, dict] = {}
    for name in names or SF10_QUERIES:
        row: dict = {}
        for tag, sf_dir in [("sf1", SF1_DIR), ("sf10", SF10_DIR)]:
            limit = TIMEOUT_S[tag]
            try:
                # warm-up excluded from timing (plan + page cache); timing
                # reps construct a FRESH plan each time — same protocol as
                # sf1_canary, so no cross-rep shuffle reuse flatters the
                # number
                _count_with_ceiling(
                    spark, qs[name], sf_dir, limit, f"{name}@{tag}#warm"
                )
                best = float("inf")
                for i in range(2):
                    t0 = time.perf_counter()
                    n_rows = _count_with_ceiling(
                        spark, qs[name], sf_dir, limit, f"{name}@{tag}#{i}"
                    )
                    best = min(best, time.perf_counter() - t0)
                row[tag] = round(best, 3)
                row[f"rows_{tag}"] = n_rows
            except Timeout as exc:
                print(f"sf10-canary: {name}@{tag} TIMEOUT: {exc}",
                      file=sys.stderr)
                row[tag] = None
                row["verdict"] = "TIMEOUT"
            except Exception as exc:  # noqa: BLE001
                print(f"sf10-canary: {name}@{tag} FAILED: {exc}",
                      file=sys.stderr)
                row[tag] = None
        if row.get("sf1") and row.get("sf10"):
            row["ratio"] = round(row["sf10"] / row["sf1"], 1)
            row["verdict"] = (
                "linear-ish" if row["ratio"] <= 30 else "SUPER-LINEAR"
            )
            if row.get("rows_sf1", 0) > 0 and row.get("rows_sf10") == 0:
                row["verdict"] = "VACUOUS-AT-SF10"
        out[name] = row
        print(f"  {name}: {row}", file=sys.stderr)
    # merge-don't-shrink (same rule as CANARY_RATIOS.json): a chunked or
    # spot run overwrites only the queries it measured
    try:
        with open(OUT) as fh:
            prev = json.load(fh)
        if prev.get("copies") != COPIES:
            prev = {}
    except (OSError, ValueError):
        prev = {}
    merged = {**(prev.get("queries") or {}), **out}
    payload = {"copies": COPIES, "queries": merged}
    with open(OUT, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps(payload, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
