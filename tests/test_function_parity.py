"""SURVEY.md §2.8 as a test: all 287 Hive-2.3.10 FunctionRegistry names are
accounted for — natively in Spark, by a hive_compat shim, by a documented
equivalent surface, or as documented engine-internal/removed plumbing."""

from __future__ import annotations

from hive_apache_ci_spark.functions import hive_compat
from hive_apache_ci_spark.functions.parity import (
    EQUIVALENT,
    HIVE_FUNCTION_NAMES,
    INTERNAL,
    NATIVE,
    REMOVED,
    SHIMMED,
)


def test_registry_is_complete_287():
    assert len(HIVE_FUNCTION_NAMES) == 287
    assert len(set(HIVE_FUNCTION_NAMES)) == 287


def test_buckets_partition_the_registry():
    buckets = [set(NATIVE), set(SHIMMED), set(EQUIVALENT), set(INTERNAL), set(REMOVED)]
    union = set().union(*buckets)
    assert union == set(HIVE_FUNCTION_NAMES), (
        set(HIVE_FUNCTION_NAMES) - union,
        union - set(HIVE_FUNCTION_NAMES),
    )
    total = sum(len(b) for b in buckets)
    assert total == 287, f"buckets overlap: {total} classified for 287 names"


def test_native_names_exist_in_spark(spark):
    spark_fns = {r.function for r in spark.sql("SHOW FUNCTIONS").collect()}
    missing = [n for n in NATIVE if n not in spark_fns]
    assert not missing, f"claimed-native Hive names absent from Spark: {missing}"


def test_shims_exist_and_are_callable():
    for hive_name, attr in SHIMMED.items():
        fn = getattr(hive_compat, attr, None)
        assert callable(fn), f"shim for {hive_name!r} missing: hive_compat.{attr}"


def test_documented_buckets_carry_reasons():
    for bucket in (EQUIVALENT, INTERNAL, REMOVED):
        for name, reason in bucket.items():
            assert isinstance(reason, str) and len(reason) > 10, name
