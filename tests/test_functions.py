"""Unit tests for Hive-compat shims and Spark builtins with no DuckDB
counterpart (SURVEY.md §2.8 — initcap, soundex, find_in_set, format_number,
conv, bin, hex, parse_url, xpath, levenshtein) plus shim edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_apache_ci_spark.functions import hive_compat as hc


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_spark_native_hive_builtins(spark):
    assert one(spark, F.initcap(F.lit("hello world"))) == "Hello World"
    assert one(spark, F.soundex(F.lit("Robert"))) == "R163"
    assert one(spark, F.expr("find_in_set('b', 'a,b,c')")) == 2
    assert one(spark, F.format_number(F.lit(1234567.891), 2)) == "1,234,567.89"
    assert one(spark, F.conv(F.lit("255"), 10, 16)) == "FF"
    assert one(spark, F.bin(F.lit(5))) == "101"
    assert one(spark, F.hex(F.lit("AB"))) == "4142"
    assert one(spark, F.levenshtein(F.lit("kitten"), F.lit("sitting"))) == 3
    assert (
        one(spark, F.parse_url(F.lit("http://h.com/p?q=1"), F.lit("HOST"))) == "h.com"
    )
    assert (
        one(spark, F.expr("xpath_string('<a><b>bb</b></a>', 'a/b')")) == "bb"
    )


def test_field_shim(spark):
    assert one(spark, hc.field(F.lit("F"), "O", "F", "P")) == 2
    assert one(spark, hc.field(F.lit("Z"), "O", "F", "P")) == 0


def test_floor_family(spark):
    ts = F.lit("2024-03-17 14:45:33").cast("timestamp")
    fmt = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    assert one(spark, fmt(hc.floor_hour(ts))) == "2024-03-17 14:00:00"
    assert one(spark, fmt(hc.floor_day(ts))) == "2024-03-17 00:00:00"
    assert one(spark, fmt(hc.floor_week(ts))) == "2024-03-11 00:00:00"
    assert one(spark, fmt(hc.floor_quarter(ts))) == "2024-01-01 00:00:00"
    assert one(spark, fmt(hc.floor_year(ts))) == "2024-01-01 00:00:00"


@pytest.mark.parametrize(
    "fn,n,expected",
    [
        (hc.mask, None, "Xxxx-nnnn Xx"),
        (hc.mask_first_n, 4, "Xxxx-1234 Ab"),
        (hc.mask_last_n, 4, "Abcd-123n Xx"),
        (hc.mask_show_first_n, 4, "Abcd-nnnn Xx"),
        (hc.mask_show_last_n, 4, "Xxxx-nnn4 Ab"),
    ],
)
def test_mask_family(spark, fn, n, expected):
    col = F.lit("Abcd-1234 Ab")
    out = one(spark, fn(col) if n is None else fn(col, n))
    assert out == expected


def test_mask_short_string(spark):
    # n longer than the string must not throw or duplicate
    assert one(spark, hc.mask_show_first_n(F.lit("ab"), 4)) == "ab"
    assert one(spark, hc.mask_last_n(F.lit("ab"), 4)) == "xx"


def test_in_file(spark, tmp_path):
    f = tmp_path / "allow.txt"
    f.write_text("alpha\nbeta\n")
    df = spark.createDataFrame([("alpha",), ("gamma",)], ["w"])
    got = df.select(hc.in_file(F.col("w"), str(f)).alias("ok")).collect()
    assert [r.ok for r in got] == [True, False]


def test_sort_array_by(spark):
    df = spark.createDataFrame(
        [(1, [{"k": 2, "v": "b"}, {"k": 1, "v": "a"}, {"k": 3, "v": "c"}])],
        "id int, arr array<struct<k:int,v:string>>",
    )
    out = df.select(
        F.transform(hc.sort_array_by(F.col("arr"), "k"), lambda s: s.getField("v")).alias("v")
    ).collect()[0].v
    assert out == ["a", "b", "c"]
    out_desc = df.select(
        F.transform(
            hc.sort_array_by(F.col("arr"), "k", asc=False), lambda s: s.getField("v")
        ).alias("v")
    ).collect()[0].v
    assert out_desc == ["c", "b", "a"]


def test_ngrams(spark):
    df = spark.createDataFrame(
        [("the cat sat",), ("the cat ran",), ("a dog sat",)], ["text"]
    )
    top = hc.ngrams(df, "text", 2, 2).collect()
    assert top[0].ngram == "the cat" and top[0].estfrequency == 2.0


def test_context_ngrams(spark):
    df = spark.createDataFrame(
        [("the cat sat",), ("the cat ran",), ("the dog sat",)], ["text"]
    )
    top = hc.context_ngrams(df, "text", ["the", None], 3).collect()
    got = {r.ngram: r.estfrequency for r in top}
    assert got == {"cat": 2.0, "dog": 1.0}


def test_replicate_rows(spark):
    df = spark.createDataFrame([("a", 3), ("b", 1)], ["v", "n"])
    out = hc.replicate_rows(df, F.col("n"), ["v"]).groupBy("v").count().collect()
    assert {r.v: r["count"] for r in out} == {"a": 3, "b": 1}


def test_parse_url_tuple(spark):
    df = spark.createDataFrame([("https://ex.org/a/b?x=7&y=8#frag",)], ["url"])
    row = df.select(
        *hc.parse_url_tuple(F.col("url"), "HOST", "PATH", "QUERY:y", "REF")
    ).collect()[0]
    assert (row.host, row.path, row.query_y, row.ref) == ("ex.org", "/a/b", "8", "frag")


def test_str_to_map(spark):
    got = one(spark, F.expr("str_to_map('a:1,b:2', ',', ':')"))
    assert got == {"a": "1", "b": "2"}


def test_sentences(spark):
    got = one(spark, F.sentences(F.lit("Hello world. How are you?")))
    assert got == [["Hello", "world"], ["How", "are", "you"]]


def test_char_varchar_padding(spark):
    """Documented divergence (SURVEY.md §1.3): Hive CHAR(n) pads on
    comparison; Spark's CAST AS CHAR(n) does NOT pad the value (padding
    applies on table reads via spark.sql.readSideCharPadding). Hive-compat
    comparisons therefore rpad explicitly."""
    df = spark.sql("SELECT CAST('ab' AS CHAR(5)) = CAST('ab   ' AS CHAR(5)) AS eq")
    assert df.collect()[0].eq is False  # Spark cast keeps the raw value
    df2 = spark.sql("SELECT rpad('ab', 5, ' ') = 'ab   ' AS eq")
    assert df2.collect()[0].eq is True
