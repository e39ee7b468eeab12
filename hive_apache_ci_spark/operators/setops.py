"""Set operations (SURVEY.md §2.7).

Hive mechanics: UNION ALL is the native UnionOperator; UNION DISTINCT adds a
group-by-all-columns; INTERSECT/EXCEPT [ALL] are Calcite rewrites
(HiveIntersectRewriteRule / HiveExceptRewriteRule using the
``replicate_rows`` UDTF). Spark has all six natively.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..helpers import T
from ..registry import query


def _year_slice(spark, sf_dir, lo: str, hi: str):
    o = T(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
    ).select("o_orderstatus", "o_orderpriority")


_SLICE_SQL = (
    "SELECT o_orderstatus, o_orderpriority FROM orders "
    "WHERE o_orderdate >= TIMESTAMP '{lo}' AND o_orderdate < TIMESTAMP '{hi}'"
)
_S95 = _SLICE_SQL.format(lo="1995-01-01", hi="1996-01-01")
_S96 = _SLICE_SQL.format(lo="1996-01-01", hi="1997-01-01")


@query(
    "set_union_all",
    oracle=f"SELECT * FROM ({_S95} UNION ALL {_S96})",
)
def set_union_all(spark, sf_dir):
    """UNION ALL — native UnionOperator; duplicates preserved."""
    return _year_slice(spark, sf_dir, "1995-01-01", "1996-01-01").union(
        _year_slice(spark, sf_dir, "1996-01-01", "1997-01-01")
    )


@query(
    "set_union_distinct",
    oracle=f"SELECT * FROM ({_S95} UNION {_S96})",
)
def set_union_distinct(spark, sf_dir):
    """UNION [DISTINCT] — union + dedup over all columns."""
    return (
        _year_slice(spark, sf_dir, "1995-01-01", "1996-01-01")
        .union(_year_slice(spark, sf_dir, "1996-01-01", "1997-01-01"))
        .distinct()
    )


@query(
    "set_intersect",
    oracle=f"SELECT * FROM ({_S95} INTERSECT {_S96})",
)
def set_intersect(spark, sf_dir):
    """INTERSECT (distinct semantics)."""
    return _year_slice(spark, sf_dir, "1995-01-01", "1996-01-01").intersect(
        _year_slice(spark, sf_dir, "1996-01-01", "1997-01-01")
    )


@query(
    "set_intersect_all",
    oracle=f"SELECT * FROM ({_S95} INTERSECT ALL {_S96})",
)
def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL — multiset intersection (min of per-side counts)."""
    return _year_slice(spark, sf_dir, "1995-01-01", "1996-01-01").intersectAll(
        _year_slice(spark, sf_dir, "1996-01-01", "1997-01-01")
    )


@query(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def set_except(spark, sf_dir):
    """EXCEPT / MINUS (distinct semantics)."""
    rich = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    big_buyers = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return rich.exceptAll(big_buyers.distinct()).distinct()


@query(
    "set_except_all",
    oracle=f"SELECT * FROM ({_S95} EXCEPT ALL {_S96})",
)
def set_except_all(spark, sf_dir):
    """EXCEPT ALL — multiset difference (count-sensitive)."""
    return _year_slice(spark, sf_dir, "1995-01-01", "1996-01-01").exceptAll(
        _year_slice(spark, sf_dir, "1996-01-01", "1997-01-01")
    )


@query(
    "set_union_by_name",
    oracle="""
    SELECT k, v, src FROM (
      SELECT c_custkey AS k, round(c_acctbal, 2) AS v, 'cust' AS src
      FROM customer WHERE c_custkey <= 100
      UNION ALL
      SELECT s_suppkey AS k, round(s_acctbal, 2) AS v, 'supp' AS src
      FROM supplier
    )
    """,
)
def set_union_by_name(spark, sf_dir):
    """unionByName with allowMissingColumns — schema-aligned union (Hive
    requires positional UNION; Spark's by-name form is the safe superset)."""
    c = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select(
            F.col("c_custkey").alias("k"),
            F.round("c_acctbal", 2).alias("v"),
            F.lit("cust").alias("src"),
        )
    )
    s = T(spark, sf_dir, "supplier").select(
        F.lit("supp").alias("src"),
        F.round("s_acctbal", 2).alias("v"),
        F.col("s_suppkey").alias("k"),
    )  # deliberately different column ORDER — unionByName must align
    return c.unionByName(s)
