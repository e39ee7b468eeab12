"""UDTF / LATERAL VIEW surface (SURVEY.md §2.1 #16–17).

Hive: UDTFOperator (1 row → N rows: explode/posexplode/inline/stack/
json_tuple) + LateralViewForward/LateralViewJoinOperator joining each input
row to its generated rows. Spark: ``explode``/``posexplode``/``inline``/
``stack`` expressions inside select — the lateral join is implicit (Catalyst
``Generate`` node).

Scale note: Generate is pipelined inside the stage (no shuffle); exploding a
text column fans rows out ~n_tokens× — the follow-up aggregation partial-
aggregates map-side before any exchange.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..helpers import T
from ..registry import query


@query(
    "explode_tokens",
    oracle="""
    SELECT tok, count(*) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
    WHERE tok <> ''
    GROUP BY tok
    """,
)
def explode_tokens(spark, sf_dir):
    """LATERAL VIEW explode(split(text)) — word-count over documents
    (UDTFOperator + LateralViewJoinOperator in Hive)."""
    d = T(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "posexplode_tokens",
    oracle="""
    SELECT doc_id, u.pos AS pos, u.tok AS tok
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, len(a)+1),
                                   i -> {'pos': i-1, 'tok': a[i]})) AS u
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS a
            FROM documents WHERE doc_id < 20)
    )
    """,
)
def posexplode_tokens(spark, sf_dir):
    """posexplode — position-aware UDTF; DuckDB oracle emulates ordinality
    with a struct-list unnest."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "tok"),
    )


@query(
    "lateral_view_outer",
    oracle="""
    SELECT s_suppkey, tok
    FROM (
      SELECT s_suppkey,
             CASE WHEN s_nationkey % 3 = 0 THEN [NULL]
                  ELSE string_split(s_name, '_') END AS toks
      FROM supplier
    ), unnest(toks) AS t(tok)
    """,
)
def lateral_view_outer(spark, sf_dir):
    """LATERAL VIEW OUTER: rows whose generator output is empty survive
    null-padded (explode_outer). Oracle emulates by substituting [NULL]."""
    s = T(spark, sf_dir, "supplier").withColumn(
        "toks",
        F.when(F.col("s_nationkey") % 3 == 0, F.lit(None).cast("array<string>"))
        .otherwise(F.split(F.col("s_name"), "_")),
    )
    return s.select("s_suppkey", F.explode_outer("toks").alias("tok"))


@query(
    "udtf_stack",
    oracle="""
    SELECT c_custkey, metric, val FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val
      FROM customer WHERE c_custkey <= 50
      UNION ALL
      SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val
      FROM customer WHERE c_custkey <= 50
    )
    """,
)
def udtf_stack(spark, sf_dir):
    """stack(n, ...) — unpivot UDTF (Hive registry name ``stack``)."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 50)
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, 'nationkey', cast(c_nationkey as double))"
        ).alias("metric", "val"),
    )


@query(
    "udtf_inline",
    oracle="""
    SELECT o_orderkey, part, amount FROM (
      SELECT o_orderkey, 'base' AS part, round(o_totalprice, 2) AS amount
      FROM orders WHERE o_orderkey <= 300
      UNION ALL
      SELECT o_orderkey, 'tax' AS part, round(o_totalprice * 0.1, 4) AS amount
      FROM orders WHERE o_orderkey <= 300
    )
    """,
)
def udtf_inline(spark, sf_dir):
    """inline(array(struct(...))) — explode an array of structs into columns
    (GenericUDTFInline)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    return o.select(
        "o_orderkey",
        F.expr(
            "inline(array("
            "named_struct('part', 'base', 'amount', round(o_totalprice, 2)), "
            "named_struct('part', 'tax', 'amount', round(o_totalprice * 0.1, 4))))"
        ),
    )


@query(
    "udtf_json_tuple",
    oracle="""
    SELECT event_id, json_extract_string(props, '$.k') AS k
    FROM events WHERE event_id < 200
    """,
)
def udtf_json_tuple(spark, sf_dir):
    """json_tuple — multi-field JSON extraction UDTF over events.props."""
    e = T(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return e.select("event_id", F.json_tuple(F.col("props"), "k").alias("k"))


@query(
    "explode_map",
    oracle="""
    SELECT r_regionkey, 'name' AS k, r_name AS v FROM region
    UNION ALL
    SELECT r_regionkey, 'key_str' AS k, CAST(r_regionkey AS VARCHAR) AS v FROM region
    """,
)
def explode_map(spark, sf_dir):
    """explode over a MAP column (Hive map type → key/value rows)."""
    r = T(spark, sf_dir, "region").withColumn(
        "m",
        F.create_map(
            F.lit("name"), F.col("r_name"),
            F.lit("key_str"), F.col("r_regionkey").cast("string"),
        ),
    )
    return r.select("r_regionkey", F.explode("m").alias("k", "v"))
