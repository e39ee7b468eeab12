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
