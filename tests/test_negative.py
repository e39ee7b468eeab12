"""Expected-error parity suite — the TestNegativeCliDriver analogue.

The reference's qtest layout pairs clientpositive with ``clientnegative``
(SURVEY.md §5.1.1): ~1,000 ``.q`` scripts whose checked-in expectation is
the ERROR, not a result. This suite mirrors the major clientnegative
categories against the engine session (ANSI off — the Hive-compatible
posture session.py pins): ill-formed queries must fail with the right
error class AND the Hive-permissive behaviors that are legal (NULL on
div-by-zero, NULL on bad casts) must stay non-errors. Each case cites the
upstream clientnegative family it stands in for.
"""

from __future__ import annotations

import pytest
from pyspark.errors import AnalysisException, ParseException

from hive_apache_ci_spark.catalog import load_tables

from .conftest import SF_DIR


@pytest.fixture(scope="module", autouse=True)
def _tables(spark):
    load_tables(spark, SF_DIR, register=True)


# ---- semantic-analysis errors (clientnegative/invalid_*.q) ---------------


def test_unresolved_column_fails(spark):
    """clientnegative/invalid_select_column.q: a column that exists in no
    input must fail analysis (never silently NULL)."""
    with pytest.raises(AnalysisException) as e:
        spark.sql("SELECT no_such_col FROM region").collect()
    assert "no_such_col" in str(e.value)


def test_ambiguous_column_fails(spark):
    """clientnegative/ambiguous_col.q: an unqualified name visible from
    both join sides must be rejected, not resolved arbitrarily."""
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT n_nationkey FROM nation a JOIN nation b"
            " ON a.n_regionkey = b.n_regionkey"
        ).collect()


def test_nonaggregated_column_outside_group_by_fails(spark):
    """clientnegative/groupby_key.q: selecting a non-grouped, non-
    aggregated column is a semantic error (Hive without
    hive.groupby.orderby.position ≈ Spark's MISSING_AGGREGATION)."""
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT r_name, r_regionkey FROM region GROUP BY r_name"
        ).collect()


def test_nested_aggregate_fails(spark):
    """clientnegative/nested_aggregate.q (udaf_invalid_place family):
    an aggregate of an aggregate cannot be evaluated in one group."""
    with pytest.raises(AnalysisException):
        spark.sql("SELECT sum(max(r_regionkey)) FROM region").collect()


def test_udtf_in_where_clause_fails(spark):
    """clientnegative/udtf_not_supported_place.q: generators (explode)
    are select/lateral-view constructs; predicates can't host them."""
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT * FROM region WHERE explode(array(1, 2)) = 1"
        ).collect()


def test_wrong_function_arity_fails(spark):
    """clientnegative/udf_function_does_not_implement.q family: wrong
    argument count for a builtin must fail analysis."""
    with pytest.raises(AnalysisException):
        spark.sql("SELECT substr() FROM region").collect()


def test_union_column_count_mismatch_fails(spark):
    """clientnegative/union2.q (schema-mismatch family): UNION arms with
    different column counts must be rejected."""
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT r_regionkey FROM region"
            " UNION ALL SELECT n_regionkey, n_name FROM nation"
        ).collect()


def test_missing_table_fails(spark):
    """clientnegative/nonexistent table family (analyze_non_existent_tbl,
    alter_non_native, ...): unknown relation → TABLE_OR_VIEW_NOT_FOUND."""
    with pytest.raises(AnalysisException):
        spark.sql("SELECT * FROM definitely_not_a_table_xyz").collect()


def test_window_frame_without_order_fails(spark):
    """clientnegative/ptf_negative_* family: a RANGE frame with an offset
    requires an ORDER BY — frame without ordering is rejected."""
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT sum(r_regionkey) OVER"
            " (RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) FROM region"
        ).collect()


# ---- parse errors (clientnegative parse family) --------------------------


def test_garbage_sql_is_parse_error(spark):
    with pytest.raises(ParseException):
        spark.sql("SELEKT * FORM region").collect()


def test_unbalanced_parens_is_parse_error(spark):
    with pytest.raises(ParseException):
        spark.sql("SELECT count(* FROM region").collect()


# ---- Hive-permissive NON-errors (the behaviors ANSI would reject) --------
#
# The flip side of clientnegative: these are legal in Hive dialect and the
# session pins ANSI off (session.py) — a conf drift to ANSI would turn
# them into runtime errors and break oracle parity silently. Pin them.


def test_division_by_zero_is_null_not_error(spark):
    row = spark.sql("SELECT 1 / 0 AS d, 1 % 0 AS m").collect()[0]
    assert row["d"] is None and row["m"] is None


def test_bad_string_cast_is_null_not_error(spark):
    row = spark.sql(
        "SELECT CAST('notanumber' AS INT) AS i, CAST('20xx-01-01' AS DATE) AS d"
    ).collect()[0]
    assert row["i"] is None and row["d"] is None


def test_array_index_out_of_bounds_is_null_not_error(spark):
    row = spark.sql("SELECT array(1, 2)[9] AS v").collect()[0]
    assert row["v"] is None


def test_ansi_is_off_in_engine_session(spark):
    """The permissive behaviors above exist BECAUSE session.py sets
    ansi.enabled=false; if bootstrap drops the conf, fail here with the
    reason rather than three tests up with a confusing error."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
