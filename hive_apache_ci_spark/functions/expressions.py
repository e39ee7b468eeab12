"""Scalar function catalog queries (SURVEY.md §2.8).

Hive 2.3.10's FunctionRegistry has 287 names; 242 exist verbatim in Spark
4.1.2 (verified set-diff in the survey). These queries exercise the families
with DuckDB-expressible semantics: string, math, date/time, conditional,
cast (Hive permissive mode), hash, JSON, regex, collection/higher-order.
Cross-engine mapping notes live next to each oracle (e.g. DuckDB
``epoch()`` is DOUBLE → cast; ``dayofweek`` is 0-based → +1).

Functions with no DuckDB counterpart (initcap, soundex, find_in_set,
format_number, parse_url, xpath*, conv, bin, hex-of-string) are covered by
pytest unit tests in tests/test_functions.py instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..helpers import T
from ..registry import query


@query(
    "expr_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                          AS up_name,
           lower(p_brand)                         AS lo_brand,
           length(p_name)                         AS name_len,
           substr(p_name, 1, 5)                   AS name5,
           concat_ws('|', p_brand, p_type)        AS brand_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0')  AS size4,
           rpad(p_brand, 10, '.')                 AS brand10,
           trim(concat('  ', p_type, ' '))        AS trimmed,
           replace(p_name, ' ', '_')              AS snake,
           reverse(p_brand)                       AS rev_brand,
           repeat(left(p_type, 2), 2)             AS rep2,
           translate(p_brand, '#', '-')           AS brand_dash,
           CAST(instr(p_name, 'a') AS BIGINT)     AS first_a,
           ascii(p_type)                          AS first_code,
           split_part(p_brand, '#', 2)            AS brand_num
    FROM part
    WHERE p_partkey <= 500
    """,
)
def expr_string_funcs(spark, sf_dir):
    """String family: upper/lower/length/substr/concat_ws/lpad/rpad/trim/
    replace/reverse/repeat/translate/instr/ascii (+ split_part, Hive's
    substring_index cousin)."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("lo_brand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.rpad("p_brand", 10, ".").alias("brand10"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("trimmed"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.reverse("p_brand").alias("rev_brand"),
        F.repeat(F.substring("p_type", 1, 2), 2).alias("rep2"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.instr("p_name", "a").cast("bigint").alias("first_a"),
        F.ascii("p_type").alias("first_code"),
        F.split_part("p_brand", F.lit("#"), F.lit(2)).alias("brand_num"),
    )


@query(
    "expr_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 30000), 4)       AS abs_diff,
           CAST(ceil(l_quantity / 7) AS BIGINT)          AS ceil_q,
           CAST(floor(l_quantity / 7) AS BIGINT)         AS floor_q,
           round(sqrt(l_extendedprice), 6)               AS sqrt_p,
           round(pow(l_discount, 2), 8)                  AS disc_sq,
           round(ln(l_extendedprice), 6)                 AS ln_p,
           round(log10(l_extendedprice), 6)              AS log10_p,
           round(exp(l_discount), 8)                     AS exp_d,
           CAST(sign(l_quantity - 25) AS DOUBLE)         AS sign_q,
           CAST(((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS BIGINT) AS pmod7,
           round(sin(l_discount), 8)                     AS sin_d,
           round(cos(l_discount), 8)                     AS cos_d,
           greatest(l_quantity, CAST(l_linenumber AS DOUBLE) * 10.0) AS gr,
           least(l_quantity, CAST(l_linenumber AS DOUBLE) * 10.0)    AS le
    FROM lineitem
    WHERE l_orderkey <= 400
    """,
)
def expr_math_funcs(spark, sf_dir):
    """Math family. ``pmod`` (Hive positive modulus) is emulated in the
    oracle as ((a%b)+b)%b; ``l_quantity/7`` exercises Hive's int/int→double
    division (ANSI off)."""
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 30000), 4).alias("abs_diff"),
        F.ceil(F.col("l_quantity") / 7).alias("ceil_q"),
        F.floor(F.col("l_quantity") / 7).alias("floor_q"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_p"),
        F.round(F.pow("l_discount", F.lit(2)), 8).alias("disc_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_p"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_p"),
        F.round(F.exp("l_discount"), 8).alias("exp_d"),
        F.signum(F.col("l_quantity") - 25).alias("sign_q"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("pmod7"),
        F.round(F.sin("l_discount"), 8).alias("sin_d"),
        F.round(F.cos("l_discount"), 8).alias("cos_d"),
        F.greatest(F.col("l_quantity"), F.col("l_linenumber").cast("double") * 10.0).alias("gr"),
        F.least(F.col("l_quantity"), F.col("l_linenumber").cast("double") * 10.0).alias("le"),
    )


@query(
    "expr_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)                    AS y,
           CAST(month(o_orderdate) AS INTEGER)                   AS m,
           CAST(day(o_orderdate) AS INTEGER)                     AS d,
           CAST(quarter(o_orderdate) AS INTEGER)                 AS q,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER)           AS dow,
           CAST(dayofyear(o_orderdate) AS INTEGER)               AS doy,
           CAST(weekofyear(o_orderdate) AS INTEGER)              AS woy,
           strftime(o_orderdate, '%Y-%m-%d')                     AS iso_day,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d')  AS plus30d,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_95,
           CAST(epoch(o_orderdate) AS BIGINT)                    AS epoch_s
    FROM orders
    WHERE o_orderkey <= 500
    """,
)
def expr_date_funcs(spark, sf_dir):
    """Date/time family. Cross-engine notes: Spark ``dayofweek`` is 1-based
    Sunday=1 vs DuckDB 0-based (+1 in oracle); Spark ``weekofyear`` is ISO —
    matches DuckDB ``weekofyear``; dates are formatted to strings so the
    hash compares text, not engine datetime types."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.quarter(d).alias("q"),
        F.dayofweek(d).alias("dow"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("woy"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3m"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30d"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).alias("days_since_95"),
        F.unix_timestamp(d).alias("epoch_s"),
    )


@query(
    "expr_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END                                  AS bal_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER')   AS seg_or_other,
           CASE WHEN c_custkey % 2 = 0 THEN 'even' ELSE 'odd' END AS parity,
           coalesce(CASE WHEN c_acctbal > 9990 THEN c_acctbal END, 0.0) AS vip_bal,
           (c_acctbal IS NULL)                                   AS bal_is_null,
           (c_nationkey IS NOT NULL)                             AS nat_not_null
    FROM customer
    """,
)
def expr_conditional(spark, sf_dir):
    """Conditional family: CASE WHEN / if / nvl / coalesce / nullif /
    isnull / isnotnull (all Hive registry names)."""
    c = T(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.nvl(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.expr("if(c_custkey % 2 = 0, 'even', 'odd')").alias("parity"),
        F.coalesce(
            F.when(F.col("c_acctbal") > 9990, F.col("c_acctbal")), F.lit(0.0)
        ).alias("vip_bal"),
        F.isnull("c_acctbal").alias("bal_is_null"),
        F.col("c_nationkey").isNotNull().alias("nat_not_null"),
    )


@query(
    "expr_cast_permissive",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INTEGER)            AS bad_int,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT)     AS roundtrip_key,
           CAST(trunc(o_totalprice) AS BIGINT)             AS price_int,
           CAST(o_orderkey AS DOUBLE) / 4                  AS key_quarter,
           CAST((o_totalprice > 300000) AS INTEGER)        AS is_big_int,
           concat('k=', CAST(o_orderkey AS VARCHAR))       AS key_str
    FROM orders
    WHERE o_orderkey <= 400
    """,
)
def expr_cast_permissive(spark, sf_dir):
    """Hive permissive casts (ANSI off): bad cast → NULL (DuckDB TRY_CAST),
    double→int truncation, int/int → double division, implicit
    numeric→string concat."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").cast("int").alias("bad_int"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("roundtrip_key"),
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        (F.col("o_orderkey").cast("double") / 4).alias("key_quarter"),
        (F.col("o_totalprice") > 300000).cast("int").alias("is_big_int"),
        F.concat(F.lit("k="), F.col("o_orderkey").cast("string")).alias("key_str"),
    )


@query(
    "expr_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text)                 AS md5_text,
           sha256(text)              AS sha256_text,
           md5(concat(lang, source)) AS md5_meta,
           length(md5(text))         AS md5_len
    FROM documents
    WHERE doc_id < 100
    """,
)
def expr_hash_funcs(spark, sf_dir):
    """Hash family: md5 / sha2-256 (Hive: UDFMd5, GenericUDFSha2)."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_text"),
        F.sha2("text", 256).alias("sha256_text"),
        F.md5(F.concat("lang", "source")).alias("md5_meta"),
        F.length(F.md5("text")).alias("md5_len"),
    )


@query(
    "expr_json",
    oracle="""
    SELECT event_type,
           count(*)                                               AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
               AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)) + 1e-9, 4)
               AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def expr_json(spark, sf_dir):
    """get_json_object over events.props + aggregation of the extracted
    field (Hive GenericUDFGetJsonObject; DuckDB json extension)."""
    e = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k") + F.lit(1e-9), 4).alias("avg_k"),
        )
    )


@query(
    "expr_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, '#(\\d+)', 1)              AS brand_id,
           regexp_matches(p_name, '^[a-m]')                   AS starts_early,
           regexp_replace(p_name, '[aeiou]', '*', 'g')        AS devoweled,
           len(regexp_extract_all(p_name, '[a-z]+'))          AS n_words
    FROM part
    WHERE p_partkey <= 500
    """,
)
def expr_regex(spark, sf_dir):
    """Regex family: regexp_extract / rlike / regexp_replace /
    regexp_extract_all (Hive RegexSerDe-style extraction is the same
    pattern applied at scan time — §2.2)."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_id"),
        F.col("p_name").rlike("^[a-m]").alias("starts_early"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.size(F.expr(r"regexp_extract_all(p_name, '[a-z]+', 0)")).alias("n_words"),
    )


@query(
    "expr_collection_hof",
    oracle="""
    SELECT r_regionkey,
           len(parts)                                        AS n_parts,
           list_contains(parts, 'ASIA')                      AS has_asia,
           array_to_string(list_sort(parts), ',')            AS sorted_parts,
           array_to_string(list_transform(parts, x -> upper(x)), ',') AS upper_parts,
           coalesce(array_to_string(list_filter(parts, x -> length(x) > 4), ','), '') AS long_parts,
           CAST(list_sum(list_transform(parts, x -> length(x))) AS BIGINT) AS total_len
    FROM (SELECT r_regionkey, string_split(r_name, ' ') AS parts FROM region)
    """,
)
def expr_collection_hof(spark, sf_dir):
    """Collection + higher-order functions: size/array_contains/sort_array/
    transform/filter/aggregate — Hive's collection builtins plus Spark's
    HOF superset (SURVEY.md §2.8 'bonus surface')."""
    r = T(spark, sf_dir, "region").withColumn("parts", F.split("r_name", " "))
    return r.select(
        "r_regionkey",
        F.size("parts").alias("n_parts"),
        F.array_contains("parts", "ASIA").alias("has_asia"),
        F.array_join(F.sort_array("parts"), ",").alias("sorted_parts"),
        F.array_join(F.transform("parts", lambda x: F.upper(x)), ",").alias(
            "upper_parts"
        ),
        F.array_join(F.filter("parts", lambda x: F.length(x) > 4), ",").alias(
            "long_parts"
        ),
        F.aggregate(
            F.transform("parts", lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_len"),
    )


@query(
    "expr_struct_nested",
    oracle="""
    SELECT n_nationkey,
           struct_extract(info, 'name')   AS nm,
           struct_extract(info, 'region') AS reg
    FROM (SELECT n_nationkey,
                 {'name': n_name, 'region': n_regionkey} AS info
          FROM nation)
    """,
)
def expr_struct_nested(spark, sf_dir):
    """named_struct construction + field access (Hive struct type §1.3)."""
    n = T(spark, sf_dir, "nation").withColumn(
        "info", F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))
    )
    return n.select(
        "n_nationkey",
        F.col("info.name").alias("nm"),
        F.col("info.region").alias("reg"),
    )


@query(
    "expr_bitwise",
    oracle="""
    SELECT p_partkey,
           p_size & 15                                  AS and15,
           p_size | 16                                  AS or16,
           xor(p_size, 5)                               AS xor5,
           ~p_size                                      AS notv,
           p_size << 2                                  AS shl2,
           p_size >> 1                                  AS shr1
    FROM part WHERE p_partkey <= 400
    """,
)
def expr_bitwise(spark, sf_dir):
    """Bitwise operator family (& | ^ ~ shiftleft shiftright — all in the
    Hive registry)."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") <= 400)
    return p.select(
        "p_partkey",
        F.expr("p_size & 15").alias("and15"),
        F.expr("p_size | 16").alias("or16"),
        F.expr("p_size ^ 5").alias("xor5"),
        F.expr("~p_size").alias("notv"),
        F.expr("shiftleft(p_size, 2)").alias("shl2"),
        F.expr("shiftright(p_size, 1)").alias("shr1"),
    )


@query(
    "expr_elt_choose",
    oracle="""
    SELECT o_orderkey,
           CASE (o_orderkey % 3) + 1 WHEN 1 THEN 'gold' WHEN 2 THEN 'silver'
                WHEN 3 THEN 'bronze' END                        AS tier,
           CASE WHEN o_orderstatus = 'O' THEN 'open'
                WHEN o_orderstatus = 'F' THEN 'final'
                ELSE 'other' END                                AS status_name
    FROM orders WHERE o_orderkey <= 400
    """,
)
def expr_elt_choose(spark, sf_dir):
    """elt(n, v1, v2, ...) — 1-based list pick (Hive UDFElt), plus its
    decode-style CASE cousin."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    return o.select(
        "o_orderkey",
        F.expr("elt((o_orderkey % 3) + 1, 'gold', 'silver', 'bronze')").alias("tier"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "final")
        .otherwise("other")
        .alias("status_name"),
    )


@query(
    "expr_from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER)      AS k,
           (CAST(json_extract(props, '$.k') AS INTEGER) > 50) AS k_big,
           json_valid(props)                                 AS is_valid
    FROM events WHERE event_id < 300
    """,
)
def expr_from_json_struct(spark, sf_dir):
    """from_json with an explicit schema → typed struct field access (the
    schema-on-read JSON path, vs get_json_object's string extraction in
    udtf_json_tuple/expr_json)."""
    e = T(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    parsed = e.withColumn("j", F.from_json("props", "k int"))
    return parsed.select(
        "event_id",
        F.col("j.k").alias("k"),
        (F.col("j.k") > 50).alias("k_big"),
        F.col("j").isNotNull().alias("is_valid"),
    )


@query(
    "expr_array_setops",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list_intersect(a, b)), ',')  AS inter,
           array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS uni,
           array_to_string(flatten([a, b]), ',')                  AS cat,
           list_has_all(a, b)                                     AS a_has_b
    FROM (
      SELECT n_regionkey,
             list(n_name ORDER BY n_nationkey)                       AS a,
             list(n_name ORDER BY n_nationkey DESC)[1:3]             AS b
      FROM nation GROUP BY n_regionkey
    )
    """,
)
def expr_array_setops(spark, sf_dir):
    """Array set operations (array_intersect/union/concat/flatten/
    containsAll) — Spark's HOF-era collection surface over per-region
    nation-name arrays."""
    n = T(spark, sf_dir, "nation")
    g = n.groupBy("n_regionkey").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("n_nationkey", "n_name"))),
            lambda s: s.getField("n_name"),
        ).alias("a"),
        F.slice(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("n_nationkey")).alias("k"), F.col("n_name")))
                ),
                lambda s: s.getField("n_name"),
            ),
            1,
            3,
        ).alias("b"),
    )
    return g.select(
        "n_regionkey",
        F.array_join(F.array_sort(F.array_intersect("a", "b")), ",").alias("inter"),
        F.array_join(F.array_sort(F.array_union("a", "b")), ",").alias("uni"),
        F.array_join(F.flatten(F.array("a", "b")), ",").alias("cat"),
        F.forall("b", lambda x: F.array_contains(F.col("a"), x)).alias("a_has_b"),
    )


@query(
    "expr_map_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus                             AS m_status,
           o_orderpriority                           AS m_prio,
           2                                         AS m_size,
           'prio,status'                             AS m_keys_sorted,
           upper(o_orderstatus)                      AS mv_upper,
           concat(o_orderstatus, '/', o_orderpriority) AS m_joined
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def expr_map_funcs(spark, sf_dir):
    """Map-type surface (Hive map<k,v> column semantics, SURVEY.md §1.3):
    create_map → element_at / map_keys / map_concat / transform_values.
    Every output is extracted back to a scalar, so the oracle (which has
    no reason to build the map at all) checks the full build→transform→
    extract round-trip by identity."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    m = F.map_concat(
        F.create_map(F.lit("status"), F.col("o_orderstatus")),
        F.create_map(F.lit("prio"), F.col("o_orderpriority")),
    )
    o = o.withColumn("m", m)
    upper_m = F.transform_values(F.col("m"), lambda _, v: F.upper(v))
    return o.select(
        "o_orderkey",
        F.element_at("m", "status").alias("m_status"),
        F.element_at("m", "prio").alias("m_prio"),
        F.size("m").alias("m_size"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("m_keys_sorted"),
        F.element_at(upper_m, "status").alias("mv_upper"),
        F.concat_ws(
            "/", F.element_at("m", "status"), F.element_at("m", "prio")
        ).alias("m_joined"),
    )
