"""Storage / file-format surface (SURVEY.md §2.2).

Hive's SerDe + InputFormat matrix re-expressed as Spark datasource
round-trips: parquet (primary), ORC, JSON lines, CSV, partitioned writes
with dynamic partition overwrite, and the TRANSFORM-script path as
``mapInPandas``.
"""
