"""hive_apache_ci_spark — a PySpark-native OLAP/SQL analytics engine.

A brand-new engine with the query and data-processing capability surface of
the reference ``kunpengcompute/hive-apache-ci`` (an Apache Hive fork; see
SURVEY.md) re-expressed idiomatically on Spark SQL / Catalyst / DataFrame
APIs, and extended with Structured-Streaming time-series analytics and
LLM-data-pipeline operators (dedup, similarity search, text analysis)
designed for 100 TB scale.

Layout:

- ``session``    — SparkSession factory with Hive-compatible semantics.
- ``catalog``    — testdata table loader / temp-view registration.
- ``registry``   — query + DuckDB-oracle registry consumed by the driver.
- ``operators/`` — relational operator surface (joins, aggs, windows, ...).
- ``functions/`` — Hive-compat function shims and text helpers.
- ``sources/``   — file-format round-trips, partitioned/bucketed writes.
- ``streaming/`` — Structured Streaming topologies.
- ``pipeline/``  — LLM-data-pipeline operators (dedup, ANN, text stats).
"""

__version__ = "0.1.0"
