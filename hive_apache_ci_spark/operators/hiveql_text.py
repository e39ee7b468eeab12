"""HiveQL text-level dialect parity — qtest-style replay (SURVEY.md §5.1).

Hive's dominant test mechanism is `clientpositive/*.q`: SQL *text* files
whose results are golden-filed. The operator modules cover the same
semantics through the DataFrame API; this module re-states the classic .q
idioms as literal SQL strings handed to ``catalog.run_sql`` (the
Driver.run(sql) analog — parse/analyze/optimize all Catalyst-owned), so the
*dialect surface itself* is under differential test:

- join*.q          — multi-way join chains in one FROM (implicit + explicit)
- lateral_view*.q  — LATERAL VIEW [OUTER] explode text form
- groupby*.q       — DISTINCT aggregates, HAVING, grouping sets text with
                     the GROUPING__ID virtual column
- windowing*.q     — OVER clauses with frames as text
- clusterby/distributeby/sortby .q — the Hive physical-layout clauses
- mapjoin hint     — /*+ MAPJOIN(t) */ (Spark accepts Hive's hint name)
- semijoin.q       — LEFT SEMI JOIN text form
- union*.q         — UNION [ALL|DISTINCT] mixes

Every query is a pure SQL string (no DataFrame calls), oracled in DuckDB.
DISTRIBUTE BY / SORT BY / CLUSTER BY affect layout, not content, so their
oracles are the bare SELECT (the compare is order-insensitive).

Scale notes: these texts compile to exactly the plans the DataFrame
twins produce (Catalyst does not care which front end built the tree);
the MAPJOIN-hint query is the one place text controls the physical plan,
and it broadcasts (checked live at build time, plan-gated in tests).
"""

from __future__ import annotations

from ..catalog import run_sql
from ..registry import query


def _sql(name: str, spark_text: str, oracle: str | None = None):
    """Register a text-form query; oracle defaults to the SAME text (the
    dialect-portable cases)."""

    @query(name, oracle=oracle if oracle is not None else spark_text)
    def fn(spark, sf_dir, _t=spark_text):
        return run_sql(spark, _t, sf_dir)

    fn.__name__ = name
    fn.__doc__ = f"qtest-style SQL-text replay ({name})."
    return fn


# --- join2.q idiom: implicit comma-join chain in one FROM -------------------
_sql(
    "qtext_join_chain_implicit",
    """
    SELECT n.n_name, r.r_name, CAST(count(*) AS BIGINT) AS n_cust
    FROM customer c, nation n, region r
    WHERE c.c_nationkey = n.n_nationkey
      AND n.n_regionkey = r.r_regionkey
      AND c.c_acctbal > 0
    GROUP BY n.n_name, r.r_name
    """,
)

# --- join chain, explicit JOIN ... ON, 4 tables ------------------------------
_sql(
    "qtext_join_chain_explicit",
    """
    SELECT r.r_name,
           CAST(count(DISTINCT s.s_suppkey) AS BIGINT) AS n_supp,
           CAST(count(*) AS BIGINT)                    AS n_parts
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN part p   ON p.p_partkey % 100 = s.s_suppkey % 100
    WHERE p.p_size <= 15
    GROUP BY r.r_name
    """,
)

# --- lateral_view.q: LATERAL VIEW explode(split(...)) text form --------------
_sql(
    "qtext_lateral_view",
    """
    SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n
    FROM documents
    LATERAL VIEW explode(split(lower(text), ' ')) t AS tok
    WHERE doc_id < 40 AND tok <> ''
    GROUP BY doc_id, tok
    """,
    oracle="""
    SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
          FROM documents WHERE doc_id < 40)
    WHERE tok <> ''
    GROUP BY doc_id, tok
    """,
)

# --- lateral_view_outer.q: empty generator keeps the row with NULL -----------
_sql(
    "qtext_lateral_view_outer",
    """
    SELECT o_orderkey, x
    FROM orders
    LATERAL VIEW OUTER explode(
      CASE WHEN o_orderkey % 3 = 0
           THEN array(o_orderkey, o_orderkey * 2)
           ELSE array() END) t AS x
    WHERE o_orderkey <= 300
    """,
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0
                  THEN [o_orderkey, o_orderkey * 2]
                  ELSE [] END AS arr
      FROM orders WHERE o_orderkey <= 300
    )
    SELECT o_orderkey,
           unnest(CASE WHEN len(arr) = 0 THEN [CAST(NULL AS BIGINT)]
                       ELSE arr END) AS x
    FROM base
    """,
)

# --- groupby*.q: DISTINCT aggregate + HAVING over text ------------------------
_sql(
    "qtext_groupby_distinct_having",
    """
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
                AS DOUBLE)                           AS revenue
    FROM orders
    GROUP BY o_orderstatus
    HAVING count(*) > 10
    """,
)

# --- groupby_grouping_sets.q + GROUPING__ID virtual column -------------------
_sql(
    "qtext_grouping_sets_id",
    """
    SELECT n_regionkey, n_nationkey % 5 AS grp,
           CAST(GROUPING__ID AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT)     AS n
    FROM nation
    GROUP BY n_regionkey, n_nationkey % 5
    GROUPING SETS ((n_regionkey), (n_nationkey % 5), ())
    """,
    oracle="""
    SELECT n_regionkey, n_nationkey % 5 AS grp,
           CAST(GROUPING(n_regionkey, n_nationkey % 5) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n
    FROM nation
    GROUP BY GROUPING SETS ((n_regionkey), (n_nationkey % 5), ())
    """,
)

# --- windowing.q: OVER clauses with explicit frames, as text ------------------
_sql(
    "qtext_windowing",
    """
    SELECT o_custkey, o_orderkey,
           CAST(rank() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey)
                AS INT) AS rk,
           CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    WHERE o_custkey < 200
    """,
)

# --- clusterby.q / distributeby.q / sortby.q ---------------------------------
_sql(
    "qtext_distribute_sort_by",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_orderkey <= 500
    DISTRIBUTE BY l_orderkey
    SORT BY l_orderkey, l_linenumber
    """,
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_orderkey <= 500
    """,
)

_sql(
    "qtext_cluster_by",
    """
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    CLUSTER BY o_custkey
    """,
    oracle="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)

# --- mapjoin_hint.q: Hive's /*+ MAPJOIN */ (Spark honors the Hive name) ------
_sql(
    "qtext_mapjoin_hint",
    """
    SELECT /*+ MAPJOIN(nation) */ n_name,
           CAST(count(*) AS BIGINT)  AS n_cust,
           CAST(sum(CAST(round(c_acctbal, 2) AS DECIMAL(18,2)))
                AS DOUBLE)           AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    oracle="""
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(CAST(round(c_acctbal, 2) AS DECIMAL(18,2)))
                AS DOUBLE)          AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)

# --- semijoin.q: LEFT SEMI JOIN text form ------------------------------------
_sql(
    "qtext_left_semi_join",
    """
    SELECT c_custkey, c_name
    FROM customer
    LEFT SEMI JOIN orders ON c_custkey = o_custkey
    WHERE c_custkey <= 800
    """,
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey <= 800
      AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)

# --- union*.q: UNION DISTINCT over UNION ALL branches ------------------------
_sql(
    "qtext_union_mix",
    """
    SELECT n_nationkey AS k, 'nation' AS src FROM nation
    UNION
    SELECT r_regionkey AS k, 'region' AS src FROM region
    UNION ALL
    SELECT n_regionkey AS k, 'region' AS src FROM nation WHERE n_nationkey < 5
    """,
)

# --- subquery_in.q: IN-subquery text form with correlated filter -------------
_sql(
    "qtext_subquery_in",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      AND o_orderkey <= 2000
    """,
)


# --- lateral_view_json_tuple.q: json_tuple UDTF as text ----------------------
_sql(
    "qtext_json_tuple",
    """
    SELECT event_id, k_val
    FROM events
    LATERAL VIEW json_tuple(props, 'k') t AS k_val
    WHERE event_id < 2000
    """,
    oracle="""
    SELECT event_id, json_extract_string(props, '$.k') AS k_val
    FROM events WHERE event_id < 2000
    """,
)

# --- date_udf.q idiom: INTERVAL arithmetic in a predicate + projection -------
_sql(
    "qtext_interval_arith",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE)                    AS d,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS d_plus_q
    FROM orders
    WHERE o_orderdate < DATE '1995-01-01' + INTERVAL 6 MONTH
      AND o_orderkey <= 5000
    """,
)

# --- windowing_windowspec.q: named WINDOW clause (round 10) ------------------
_sql(
    "qtext_named_window",
    """
    SELECT o_custkey, o_orderkey,
           CAST(rank() OVER w AS INT)              AS rk,
           CAST(lag(o_orderkey) OVER w AS BIGINT)  AS prev_ok
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)


# --- transform_ppr.q idiom: TRANSFORM text with ROW FORMAT DELIMITED ---------
_sql(
    "qtext_transform_using",
    """
    SELECT TRANSFORM (c_custkey, c_name)
      ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
      USING 'tr a-z A-Z'
      AS (k string, name_upper string)
      ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
    FROM customer WHERE c_custkey <= 150
    """,
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR) AS k, upper(c_name) AS name_upper
    FROM customer WHERE c_custkey <= 150
    """,
)


# --- multi_insert.q + insert_overwrite_directory.q (round 10) ----------------
#
# These two are SIDE-EFFECTING texts (Hive's FROM ... INSERT ... INSERT fans
# one scan into N sinks; INSERT OVERWRITE DIRECTORY materializes files), so
# they can't go through the pure-text _sql helper: each runs the literal
# statement, then reads its sinks back through the committed() gate and
# returns the verifiable content. The DataFrame twins live in
# sources/io_roundtrip.py (io_multi_insert, io_insert_overwrite); here the
# *dialect text itself* drives the sinks.


def _qtext_side_effect(name: str, oracle: str):
    def deco(fn):
        fn.__name__ = name
        return query(name, oracle=oracle)(fn)

    return deco


@_qtext_side_effect(
    "qtext_multi_insert",
    oracle="""
    SELECT 'hi' AS bucket, o_orderkey, round(o_totalprice, 2) AS price
    FROM orders WHERE o_totalprice >= 350000
    UNION ALL
    SELECT 'lo', o_orderkey, round(o_totalprice, 2)
    FROM orders WHERE o_totalprice < 1500
    """,
)
def qtext_multi_insert(spark, sf_dir):
    """multi_insert.q: the Hive ``FROM src INSERT ... INSERT ...`` TEXT —
    one scan fanned into two directory sinks in a single statement (the
    multi-insert grammar, not two statements). Sinks are read back
    _SUCCESS-gated and tagged; the oracle recomputes both branches from
    the table. Scale: one scan feeds both sinks (Hive's multi-insert
    optimization — the reason the idiom exists)."""
    from ..helpers import committed, run_scratch

    base = run_scratch("qtext", sf_dir, "multi_insert")
    hi, lo = f"{base}/hi", f"{base}/lo"
    run_sql(
        spark,
        f"""
        FROM orders
        INSERT OVERWRITE DIRECTORY '{hi}' USING parquet
          SELECT o_orderkey, round(o_totalprice, 2) AS price
          WHERE o_totalprice >= 350000
        INSERT OVERWRITE DIRECTORY '{lo}' USING parquet
          SELECT o_orderkey, round(o_totalprice, 2) AS price
          WHERE o_totalprice < 1500
        """,
        sf_dir,
    )
    from pyspark.sql import functions as F

    out = (
        spark.read.parquet(committed(hi))
        .select(F.lit("hi").alias("bucket"), "o_orderkey", "price")
        .unionByName(
            spark.read.parquet(committed(lo)).select(
                F.lit("lo").alias("bucket"), "o_orderkey", "price"
            )
        )
    )
    return out


@_qtext_side_effect(
    "qtext_insert_overwrite_directory",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation WHERE n_regionkey <> 2
    """,
)
def qtext_insert_overwrite_directory(spark, sf_dir):
    """insert_overwrite_directory.q: ``INSERT OVERWRITE DIRECTORY`` text
    writing Hive-style delimited TEXT files (the LazySimpleSerDe default
    ``\\x01`` field delimiter, via the csv source's delimiter option —
    sources/io_roundtrip.py:212 documents the SerDe mapping), read back
    with the same codec + explicit schema. A second run of the SAME
    statement must OVERWRITE, not append (asserted)."""
    from ..helpers import committed, run_scratch

    d = run_scratch("qtext", sf_dir, "overwrite_dir")
    stmt = f"""
        INSERT OVERWRITE DIRECTORY '{d}'
        USING csv OPTIONS (delimiter '\x01')
        SELECT n_nationkey, n_name, n_regionkey
        FROM nation WHERE n_regionkey <> 2
    """
    run_sql(spark, stmt, sf_dir)
    spark.sql(stmt)  # idempotent overwrite: same content, not doubled
    return (
        spark.read.schema("n_nationkey long, n_name string, n_regionkey long")
        .options(delimiter="\x01")
        .csv(committed(d))
    )
