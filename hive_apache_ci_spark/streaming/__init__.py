"""Time-series + streaming surface (SURVEY.md §2.10).

The reference (Hive 2.3) is batch-only — time-series analytics are batch SQL
over timestamp columns; its only 'streaming' is ACID ingest. This package
provides both forms: ``timeseries`` (batch window aggregations, DuckDB-
oracle-able) and ``jobs`` (the same topologies as Structured Streaming with
watermarks — the north-star superset; rows-only checks).
"""
