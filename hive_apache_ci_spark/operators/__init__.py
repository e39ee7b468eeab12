"""Relational operator surface (SURVEY.md §2.1–§2.7).

Each module registers named queries + DuckDB oracles with the registry:

- ``relational``  — scan/filter/project/sort/limit/distinct (TableScan,
  Filter, Select, Limit, ReduceSink-order semantics).
- ``joins``       — every HiveQL join variant (§2.3).
- ``aggregates``  — GroupByOperator surface: agg battery, grouping sets,
  rollup/cube, distinct aggs, percentiles (§2.4).
- ``setops``      — UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL] (§2.7).
- ``windows``     — PTF/windowing surface (§2.5).
- ``subqueries``  — IN/EXISTS/NOT IN/scalar subqueries (decorrelation §4.2).
- ``lateral``     — UDTF/LATERAL VIEW: explode/posexplode/stack (§2.1 #16-17).
"""
