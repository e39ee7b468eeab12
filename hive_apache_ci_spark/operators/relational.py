"""Scan / filter / project / sort / limit / distinct.

Hive operators covered (SURVEY.md §2.1): TableScanOperator (#1),
FilterOperator (#2), SelectOperator (#3), LimitOperator (#13) with top-K
pushdown (§2.6), ORDER BY single-total-order semantics (ReduceSink
numReducers=1 in Hive → range-partitioned sort in Spark), NULL ordering.

Scale notes: every query here is a declarative DataFrame plan — filters and
projections reach the parquet scan (PushedFilters / ReadSchema in
``.explain``), and ``orderBy().limit(n)`` compiles to
``TakeOrderedAndProject`` (no global sort materialization), which is exactly
the 100 TB-safe shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..helpers import T, r2, ravg, ts_lit
from ..registry import query


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity) + 1e-9, 4)                             AS avg_qty,
           round(avg(l_extendedprice) + 1e-9, 4)                        AS avg_price,
           round(avg(l_discount) + 1e-9, 4)                             AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """Flagship: TPC-H Q1-shaped pricing summary (scan→filter→agg→sort).

    Exercises the Hive pipeline TableScan→Filter→GroupBy(partial)→
    ReduceSink→GroupBy(final)→Select→FileSink in one declarative plan;
    Catalyst gives partial aggregation (map-side combine) automatically.
    """
    l = T(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= ts_lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r2(F.sum("l_quantity")).alias("sum_qty"),
            r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_price"
            ),
            r2(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge"),
            ravg(F.avg("l_quantity")).alias("avg_qty"),
            ravg(F.avg("l_extendedprice")).alias("avg_price"),
            ravg(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS revenue,
           round(l_extendedprice * l_tax, 4)            AS tax_amount,
           l_quantity * 2.0                             AS double_qty
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
      AND l_shipdate >= TIMESTAMP '1996-01-01'
    """,
)
def filter_project(spark, sf_dir):
    """Row-level filter + computed projection (FilterOperator+SelectOperator).

    The three predicates and the 5-column projection must reach the parquet
    scan as PushedFilters/ReadSchema — verified in tests/test_plans.py.
    """
    l = T(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
        & (F.col("l_shipdate") >= ts_lit("1996-01-01"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        F.round(F.col("l_extendedprice") * F.col("l_tax"), 4).alias("tax_amount"),
        (F.col("l_quantity") * F.lit(2.0)).alias("double_qty"),
    )


@query(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def distinct_rows(spark, sf_dir):
    """SELECT DISTINCT — Hive rewrites to group-by-all-columns; Spark's
    HashAggregate does the same with partial aggregation."""
    return T(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_topk(spark, sf_dir):
    """ORDER BY + LIMIT → top-K. Hive: LimitPushdownOptimizer pushes the
    limit into ReduceSink; Spark compiles to TakeOrderedAndProject (per-
    partition heaps + merge — no global sort, the scalable shape)."""
    return (
        T(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@query(
    "sort_nulls",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END AS status_nullable,
           o_totalprice
    FROM orders
    ORDER BY status_nullable ASC NULLS FIRST, o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def sort_nulls(spark, sf_dir):
    """NULL ordering semantics: Hive default = NULLS FIRST ascending (same
    as Spark). A nullable key is derived so the ordering is observable."""
    o = T(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.when(F.col("o_orderstatus") == "O", F.lit(None).cast("string"))
            .otherwise(F.col("o_orderstatus"))
            .alias("status_nullable"),
            "o_totalprice",
        )
        .orderBy(
            F.col("status_nullable").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(50)
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 100 OFFSET 50
    """,
)
def limit_offset(spark, sf_dir):
    """LIMIT/OFFSET pagination over a unique total order (deterministic)."""
    return (
        T(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .offset(50)
        .limit(100)
    )


_SLICE = "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderkey <= 2000"


@query("hive_sort_by", oracle=_SLICE)
def hive_sort_by(spark, sf_dir):
    """HiveQL ``SORT BY`` — per-reducer (per-partition) order only
    (ReduceSinkOperator without a total order). The row multiset is
    unchanged, so the order-insensitive oracle is the plain selection."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select("o_orderkey", "o_custkey", "o_orderstatus").sortWithinPartitions(
        "o_custkey", "o_orderkey"
    )


@query("hive_distribute_by", oracle=_SLICE)
def hive_distribute_by(spark, sf_dir):
    """HiveQL ``DISTRIBUTE BY`` — hash-partition rows by expression
    (ReduceSink partition columns) with no ordering guarantee."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select("o_orderkey", "o_custkey", "o_orderstatus").repartition(
        8, "o_custkey"
    )


@query("hive_cluster_by", oracle=_SLICE)
def hive_cluster_by(spark, sf_dir):
    """HiveQL ``CLUSTER BY`` = DISTRIBUTE BY + SORT BY on the same columns —
    the co-location property SMB joins and bucketed writes rely on."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return (
        o.select("o_orderkey", "o_custkey", "o_orderstatus")
        .repartition(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
    )


@query(
    "virtual_columns_metadata",
    oracle="""
    SELECT 'lineitem.parquet' AS file_name,
           CAST(1 AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS n_rows,
           TRUE AS path_matches,
           TRUE AS sizes_positive
    FROM lineitem
    """,
)
def virtual_columns_metadata(spark, sf_dir):
    """Hive virtual columns (SURVEY.md §1.3): INPUT__FILE__NAME →
    ``input_file_name()`` / the ``_metadata`` struct (file path, size,
    modification time); BLOCK__OFFSET has no Spark equivalent. The raw
    path/size values are environment-specific, so the operator is graded
    on the derivations SQL can state: the table is exactly one file named
    lineitem.parquet, every input_file_name() ends with that file name,
    per-file row counts sum to the table count, and _metadata.file_size is
    positive — all computed in-plan over the real virtual columns. Full
    hash oracle (was rows-only)."""
    l = T(spark, sf_dir, "lineitem")
    per_file = (
        l.select(
            F.input_file_name().alias("input_file"),
            F.col("_metadata.file_name").alias("file_name"),
            F.col("_metadata.file_size").alias("file_size"),
        )
        .groupBy("input_file", "file_name", "file_size")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return per_file.agg(
        F.max("file_name").alias("file_name"),
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.bool_and(F.col("input_file").endswith(F.col("file_name"))).alias(
            "path_matches"
        ),
        F.bool_and(F.col("file_size") > 0).alias("sizes_positive"),
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): the canonical
    filter-everything-then-aggregate query — every predicate must reach the
    parquet scan; no shuffle at all except the final single-group agg."""
    l = T(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= ts_lit("1997-01-01"))
        & (F.col("l_shipdate") < ts_lit("1998-01-01"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "tpch_q15_top_supplier_view",
    oracle="""
    WITH revenue_view AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue_view r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue_view)
    """,
)
def tpch_q15_top_supplier_view(spark, sf_dir):
    """TPC-H Q15 (top supplier) THROUGH A VIEW: the revenue summary is
    registered as a temp view (Hive CREATE VIEW — logical, §1.1) and
    referenced twice (join + scalar-subquery max); Catalyst ReuseExchange
    dedups the two evaluations."""
    from ..catalog import load_tables

    load_tables(spark, sf_dir, register=True)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW revenue_view AS
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
        """
    )
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN revenue_view r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue_view)
        """
    )


@query(
    "sort_global_range",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders WHERE o_totalprice > 100000
    """,
)
def sort_global_range(spark, sf_dir):
    """Globally-ordered output the scale-safe way: ``orderBy`` without a
    limit compiles to an ``Exchange rangepartitioning`` — sampled range
    boundaries, each partition sorts its slice, partitions concatenate in
    order (Hive's ``ORDER BY`` funnels through ONE reducer instead; this is
    the distributed upgrade). The result multiset is order-insensitive for
    the oracle; the plan shape (range exchange present, single-partition
    sort absent) is asserted in tests/test_plans.py."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return o.select("o_orderkey", "o_totalprice", "o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
