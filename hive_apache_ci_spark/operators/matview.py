"""Materialized-view rollup rewrite (Hive 3.x CREATE MATERIALIZED VIEW +
Calcite's AbstractMaterializedViewRule — SURVEY.md §7.8 noted the *storage*
side is out of scope, but the rewrite semantics are engine-expressible).

The Spark-first emulation is explicit: materialize the fine-grained partial
aggregate once (daily partials, parquet), then answer coarser queries by
re-aggregating the partials — never touching the fact table. The rewrite is
only correct because the aggregates COMPOSE: sum-of-daily-sums = monthly
sum, sum-of-daily-counts = monthly count, avg = composed sum / composed
count (never avg-of-avgs). The oracle recomputes the answer directly from
the fact table, so the driver hash-checks exactly that composition law.

Scale: this is the 100 TB pre-aggregation pattern — the MV is ~|days × flags|
rows regardless of fact size, the monthly query reads only the MV, and
tests/test_plans.py asserts the rewritten plan scans the MV parquet and not
lineitem."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ..helpers import T, ravg
from ..registry import query

_SCRATCH = os.path.join(tempfile.gettempdir(), "hive_apache_ci_spark_mv")


def _mv_path(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_SCRATCH, tag, name)


@query(
    "mv_rollup_rewrite",
    oracle="""
    SELECT l_returnflag,
           strftime(l_shipdate, '%Y-%m')              AS ship_month,
           CAST(count(*) AS BIGINT)                   AS n_items,
           round(sum(l_quantity), 2)                  AS sum_qty,
           round(sum(l_extendedprice), 2)             AS sum_price,
           round(sum(l_extendedprice)
                 / count(*) + 1e-9, 4)                AS avg_price
    FROM lineitem
    GROUP BY l_returnflag, strftime(l_shipdate, '%Y-%m')
    """,
)
def mv_rollup_rewrite(spark, sf_dir):
    """Monthly revenue per returnflag answered FROM the daily-partials MV
    (build step writes the MV parquet; the returned plan reads only it).
    avg_price is composed from the MV's (sum, count) partials — the
    rewrite-correctness trap (avg-of-avgs) the composition law avoids."""
    mv = _mv_path(sf_dir, "mv_daily_revenue")
    l = T(spark, sf_dir, "lineitem")
    (
        l.groupBy(
            "l_returnflag",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
        )
        .agg(
            F.count(F.lit(1)).alias("p_n"),
            F.sum("l_quantity").alias("p_qty"),
            F.sum("l_extendedprice").alias("p_price"),
        )
        .write.mode("overwrite")
        .parquet(mv)
    )
    daily = spark.read.parquet(mv)
    return (
        daily.groupBy(
            "l_returnflag", F.substring("ship_day", 1, 7).alias("ship_month")
        )
        .agg(
            F.sum("p_n").alias("n_items"),
            F.round(F.sum("p_qty"), 2).alias("sum_qty"),
            F.round(F.sum("p_price"), 2).alias("sum_price"),
            ravg(F.sum("p_price") / F.sum("p_n"), 4).alias("avg_price"),
        )
    )
