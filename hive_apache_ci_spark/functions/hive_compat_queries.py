"""Oracle-paired queries exercising the Hive-compat shims (§2.8-③)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..helpers import T
from ..registry import query
from . import hive_compat as hc


@query(
    "hive_floor_dates",
    oracle="""
    SELECT event_id,
           strftime(date_trunc('hour', ts),    '%Y-%m-%d %H:%M:%S') AS fl_hour,
           strftime(date_trunc('day', ts),     '%Y-%m-%d %H:%M:%S') AS fl_day,
           strftime(date_trunc('week', ts),    '%Y-%m-%d %H:%M:%S') AS fl_week,
           strftime(date_trunc('month', ts),   '%Y-%m-%d %H:%M:%S') AS fl_month,
           strftime(date_trunc('quarter', ts), '%Y-%m-%d %H:%M:%S') AS fl_quarter,
           strftime(date_trunc('year', ts),    '%Y-%m-%d %H:%M:%S') AS fl_year
    FROM events WHERE event_id < 300
    """,
)
def hive_floor_dates(spark, sf_dir):
    """floor_hour/day/week/month/quarter/year shims (UDFDateFloor family)."""
    e = T(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    fmt = "yyyy-MM-dd HH:mm:ss"
    ts = F.col("ts")
    return e.select(
        "event_id",
        F.date_format(hc.floor_hour(ts), fmt).alias("fl_hour"),
        F.date_format(hc.floor_day(ts), fmt).alias("fl_day"),
        F.date_format(hc.floor_week(ts), fmt).alias("fl_week"),
        F.date_format(hc.floor_month(ts), fmt).alias("fl_month"),
        F.date_format(hc.floor_quarter(ts), fmt).alias("fl_quarter"),
        F.date_format(hc.floor_year(ts), fmt).alias("fl_year"),
    )


@query(
    "hive_field_fn",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'O' THEN 1 WHEN 'F' THEN 2 WHEN 'P' THEN 3
                ELSE 0 END AS status_idx,
           CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                ELSE 0 END AS prio_idx
    FROM orders WHERE o_orderkey <= 500
    """,
)
def hive_field_fn(spark, sf_dir):
    """field(x, v1, v2, ...) shim (GenericUDFField)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        hc.field(F.col("o_orderstatus"), "O", "F", "P").alias("status_idx"),
        hc.field(F.col("o_orderpriority"), "1-URGENT", "2-HIGH").alias("prio_idx"),
    )


@query(
    "hive_mask_fns",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked,
           concat(left(c_name, 9),
                  regexp_replace(regexp_replace(regexp_replace(substr(c_name, 10),
                      '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g'))
               AS show_first9,
           md5(c_name) AS hashed
    FROM customer WHERE c_custkey <= 200
    """,
)
def hive_mask_fns(spark, sf_dir):
    """mask / mask_show_first_n / mask_hash shims (GenericUDFMask*)."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        hc.mask(F.col("c_name")).alias("masked"),
        hc.mask_show_first_n(F.col("c_name"), 9).alias("show_first9"),
        hc.mask_hash(F.col("c_name")).alias("hashed"),
    )


@query(
    "hive_replicate_rows",
    oracle="""
    SELECT n_nationkey, n_name FROM (
      SELECT n_nationkey, n_name, unnest(range(0, n_regionkey + 1)) AS i
      FROM nation
    )
    """,
)
def hive_replicate_rows(spark, sf_dir):
    """replicate_rows UDTF shim (used by Hive's INTERSECT/EXCEPT ALL
    Calcite rewrites) → explode(sequence(1, n))."""
    n = T(spark, sf_dir, "nation")
    return hc.replicate_rows(
        n, F.col("n_regionkey") + 1, ["n_nationkey", "n_name"]
    )


@query(
    "hive_ngrams_top",
    oracle="""
    SELECT ngram, CAST(n AS DOUBLE) AS estfrequency FROM (
      SELECT g AS ngram, count(*) AS n, min(g) AS tie
      FROM (
        SELECT unnest(list_transform(range(1, greatest(len(a) - 1, 0) + 1),
                      i -> concat(a[i], ' ', a[i+1]))) AS g
        FROM (SELECT string_split_regex(lower(text), '\\s+') AS a FROM documents)
      )
      WHERE g <> ''
      GROUP BY g
      ORDER BY n DESC, g
      LIMIT 15
    )
    """,
)
def hive_ngrams_top(spark, sf_dir):
    """ngrams UDAF shim (GenericUDAFnGrams): top-15 bigrams across the
    documents corpus — exact counts via explode→partial agg→top-k (the
    scalable shape; Hive's version is a driver-side estimator)."""
    return hc.ngrams(T(spark, sf_dir, "documents"), "text", 2, 15)


@query(
    "hive_sort_array_by",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list(n_name ORDER BY n_nationkey DESC), ',')
               AS nations_by_key_desc
    FROM nation GROUP BY n_regionkey
    """,
)
def hive_sort_array_by(spark, sf_dir):
    """sort_array_by(array<struct>, field) shim — array_sort + comparator
    lambda over collected structs (sorted by descending nationkey)."""
    n = T(spark, sf_dir, "nation")
    grouped = n.groupBy("n_regionkey").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("n_nationkey").alias("k"), F.col("n_name").alias("name")))
        ).alias("arr")
    )
    sorted_arr = hc.sort_array_by(F.col("arr"), "k", asc=False)
    return grouped.select(
        "n_regionkey",
        F.array_join(
            F.transform(sorted_arr, lambda s: s.getField("name")), ","
        ).alias("nations_by_key_desc"),
    )


@query(
    "hive_parse_url_tuple",
    oracle="""
    SELECT p_partkey,
           'example.com'                                        AS host,
           concat('/catalog/', lower(replace(p_brand, '#', ''))) AS path,
           CAST(p_partkey AS VARCHAR)                            AS query_id
    FROM part WHERE p_partkey <= 300
    """,
)
def hive_parse_url_tuple(spark, sf_dir):
    """parse_url_tuple UDTF shim → multi parse_url projection (HOST, PATH,
    QUERY:id) over synthesized URLs."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    url = F.concat(
        F.lit("http://example.com/catalog/"),
        F.lower(F.replace(F.col("p_brand"), F.lit("#"), F.lit(""))),
        F.lit("?id="),
        F.col("p_partkey").cast("string"),
    )
    p = p.withColumn("url", url)
    return p.select(
        "p_partkey", *hc.parse_url_tuple(F.col("url"), "HOST", "PATH", "QUERY:id")
    )


@query(
    "uniontype_tagged",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey % 3 AS TINYINT)                       AS tag,
           CASE WHEN o_orderkey % 3 = 0 THEN o_custkey END       AS u_int,
           CASE WHEN o_orderkey % 3 = 1 THEN o_orderstatus END   AS u_str,
           CASE WHEN o_orderkey % 3 = 2
                THEN round(o_totalprice, 2) END                  AS u_dbl,
           CASE WHEN o_orderkey % 3 = 0 THEN 'int'
                WHEN o_orderkey % 3 = 1 THEN 'string'
                ELSE 'double' END                                AS branch
    FROM orders WHERE o_orderkey <= 3000
    """,
)
def uniontype_tagged(spark, sf_dir):
    """Hive ``uniontype<int,string,double>`` emulation (SURVEY.md §7.8:
    no Spark-native uniontype — the standard port is a tagged struct).
    create_union → struct(tag, one non-null branch field);
    extract/``CASE WHEN tag`` → per-branch typed columns. The query builds
    real union structs and reads every branch back out through the struct,
    so the round-trip (not just the CASE arithmetic) is what the oracle
    checks."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    tag = (F.col("o_orderkey") % 3).cast("tinyint")
    u = F.struct(
        tag.alias("tag"),
        F.when(tag == 0, F.col("o_custkey")).alias("f0"),
        F.when(tag == 1, F.col("o_orderstatus")).alias("f1"),
        F.when(tag == 2, F.round(F.col("o_totalprice"), 2)).alias("f2"),
    )
    o = o.withColumn("u", u)
    return o.select(
        "o_orderkey",
        F.col("u.tag").alias("tag"),
        F.col("u.f0").alias("u_int"),
        F.col("u.f1").alias("u_str"),
        F.col("u.f2").alias("u_dbl"),
        F.when(F.col("u.tag") == 0, "int")
        .when(F.col("u.tag") == 1, "string")
        .otherwise("double")
        .alias("branch"),
    )


@query(
    "secured_view_policy",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
               AS c_name_masked,
           c_mktsegment,
           round(c_acctbal, 2) AS c_acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal >= 0
    """,
)
def secured_view_policy(spark, sf_dir):
    """Row-filter + column-mask security policy as a VIEW (the Hive/Ranger
    row-level-security and data-masking model, SURVEY §3.3 DDL surface):
    an analyst-facing view that (a) filters rows to the caller's allowed
    segments, (b) masks the PII column with the GenericUDFMask shim, and
    (c) exposes only policy-approved columns. Queries hit the VIEW, and
    Catalyst inlines it so the row filter pushes down to the parquet scan
    like any predicate — policy enforcement costs nothing at 100 TB
    because it IS just predicates and projections after inlining."""
    from ..catalog import load_tables
    from . import hive_compat as hc

    load_tables(spark, sf_dir, register=True)
    c = spark.table("customer")
    secured = c.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & (F.col("c_acctbal") >= 0)
    ).select(
        "c_custkey",
        hc.mask(F.col("c_name")).alias("c_name_masked"),
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
    )
    secured.createOrReplaceTempView("customer_secured")
    return spark.table("customer_secured")


@query(
    "matchpath_hive_error_bursts",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    marks AS (
      SELECT user_id, rn,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err,
             rn - row_number() OVER (
               PARTITION BY user_id,
                            CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
               ORDER BY rn) AS grp
      FROM seq
    )
    SELECT user_id AS part,
           CAST(min(rn) - 1 AS INT) AS start_idx,
           CAST(count(*) AS INT)    AS match_len
    FROM marks
    WHERE is_err = 1
    GROUP BY user_id, grp
    HAVING count(*) >= 2
    """,
)
def matchpath_hive_error_bursts(spark, sf_dir):
    """MatchPath under Hive's ARGUMENT convention (r8, SURVEY §2.5 —
    upstream ``matchpath(ON ... 'LATE.LATE+', 'LATE', <predicate>, ...)``):
    per-user error bursts, i.e. maximal runs of >=2 consecutive 'error'
    events in (ts, event_id) order. The named-symbol pattern ``ERR.ERR+``
    is compiled onto the single-char alphabet and matched GREEDILY — one
    row per maximal burst, exactly what the gaps-and-islands oracle
    computes independently. The OK symbol is declared but unreferenced by
    the pattern (legal in Hive; such rows simply break bursts)."""
    from . import hive_compat as hc

    e = T(spark, sf_dir, "events")
    return hc.matchpath_hive(
        e,
        "user_id",
        ["ts", "event_id"],
        "ERR.ERR+",
        [
            ("ERR", F.col("event_type") == "error"),
            ("OK", F.col("event_type") != "error"),
        ],
    )


_IN_FILE_NATIONS = (
    "NATION_2", "NATION_7", "NATION_11", "NATION_19", "NATION_23",
    "NOSUCHNATION",
)


@query(
    "hive_in_file",
    oracle="""
    SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name
    FROM nation
    WHERE n_name IN ('NATION_2', 'NATION_7', 'NATION_11', 'NATION_19',
                     'NATION_23', 'NOSUCHNATION')
    """,
)
def hive_in_file(spark, sf_dir):
    """in_file(str, filename) shim (GenericUDFInFile, SURVEY §2.8-③): the
    driver-local file is read once at plan time and folded into an isin
    literal list (a broadcast set membership — the set ships with the
    plan, nothing per-row touches the filesystem). The file is written to
    a per-run scratch path (scratch discipline) with a FIXED literal line
    set so the DuckDB oracle can mirror it as an IN list."""
    import os

    from ..helpers import run_scratch

    path = run_scratch("infile", sf_dir, "nations.txt")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(_IN_FILE_NATIONS) + "\n")
    n = T(spark, sf_dir, "nation")
    return n.filter(hc.in_file(F.col("n_name"), path)).select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"), "n_name"
    )


@query(
    "hive_logged_in_user",
    oracle="""
    SELECT CAST(r_regionkey AS INT) AS r_regionkey,
           TRUE AS user_known
    FROM region
    """,
)
def hive_logged_in_user(spark, sf_dir):
    """logged_in_user() shim (GenericUDFLoggedInUser → current_user(),
    SURVEY §2.8-③). The session user is engine-specific, so the oracled
    contract is the invariant Hive guarantees: the function yields a
    non-empty user string on every row (constant-folded, never per-row
    work)."""
    r = T(spark, sf_dir, "region")
    return r.select(
        F.col("r_regionkey").cast("int").alias("r_regionkey"),
        (F.length(hc.logged_in_user()) > F.lit(0)).alias("user_known"),
    )
