"""Temporal join operators: as-of join and binned range join.

Neither exists as a named operator in Hive 2.3 or stock Spark; both are
standard time-series/interval workloads (kdb+ ``aj``, DuckDB/Pandas
``ASOF JOIN``, TimescaleDB range queries) that users of a Hive-era
warehouse express with correlated subqueries Hive decorrelates poorly.
We implement them Spark-first:

- **as-of** via union + segmented window scan (``last(..., ignorenulls)``
  over a user-partitioned, time-ordered frame). This is the scalable shape:
  ONE shuffle on the partition key, no range-join explosion, no per-row
  subquery. At 100 TB the window scan streams each user's timeline once;
  state is a single running value per partition. DuckDB's *native*
  ``ASOF JOIN`` is the oracle — an independent implementation, not an
  echo of our plan.
- **range join** via bucket binning: each range row explodes to the fixed
  width buckets it covers, turning a non-equi interval predicate into an
  EQUI-join on bucket + residual filter. Catalyst would otherwise plan
  BroadcastNestedLoopJoin, which is O(n·m) and dies when both sides are
  large; the binned form shuffles/broadcasts on bucket equality and scales
  linearly. (Same trick Databricks' range-join hints apply internally.)
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..helpers import T, r2
from ..registry import query

# One row per (user, ts) on the build side keeps ties deterministic in both
# engines: DuckDB's ASOF picks an arbitrary peer among equal timestamps,
# ours picks the last in window order — collapsing peers first makes the
# question moot.
_ASOF_BASE = """
WITH views AS (
  SELECT user_id, ts, max(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
),
buys AS (
  SELECT user_id, event_id AS buy_id, ts
  FROM events WHERE event_type = 'purchase'
),
asof_pairs AS (
  SELECT b.user_id, b.buy_id, v.view_id,
         CAST(floor(epoch(b.ts)) AS BIGINT) AS buy_ts,
         CAST(floor(epoch(b.ts)) - floor(epoch(v.ts)) AS BIGINT) AS gap_s
  FROM buys b ASOF LEFT JOIN views v
    ON b.user_id = v.user_id AND v.ts <= b.ts
)
"""


def _asof_backward(spark, sf_dir):
    """Shared as-of scan: for every purchase, the latest view at-or-before
    it for the same user. Returns (user_id, buy_id, view_id, buy_ts, gap_s)
    with view_id/gap_s NULL when no prior view exists."""
    e = T(spark, sf_dir, "events")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("buy_id"), "ts"
    )
    tagged = views.select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        "view_id",
        F.lit(None).cast("long").alias("buy_id"),
    ).unionByName(
        buys.select(
            "user_id",
            "ts",
            F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("view_id"),
            "buy_id",
        )
    )
    # Views sort before purchases at equal ts (tag 0 < 1) — matching the
    # oracle's inclusive `v.ts <= b.ts`.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "buy_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("lv_id", F.last("view_id", ignorenulls=True).over(w))
        .withColumn(
            "lv_ts",
            F.last(
                F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("tag") == 1)
        .select(
            "user_id",
            "buy_id",
            F.col("lv_id").alias("view_id"),
            F.col("ts").cast("long").alias("buy_ts"),
            (F.col("ts").cast("long") - F.col("lv_ts").cast("long")).alias(
                "gap_s"
            ),
        )
    )


@query("join_asof_backward", oracle=_ASOF_BASE + "SELECT * FROM asof_pairs")
def join_asof_backward(spark, sf_dir):
    """As-of join (backward): each purchase matched to the same user's most
    recent view at-or-before it. Implemented as union + one window scan per
    user timeline (no join operator at all); oracled against DuckDB's
    native ASOF JOIN."""
    return _asof_backward(spark, sf_dir)


@query(
    "join_asof_tolerance",
    oracle=_ASOF_BASE
    + """
    SELECT user_id, buy_id,
           CASE WHEN gap_s <= 3600 THEN view_id END AS view_id,
           buy_ts,
           CASE WHEN gap_s <= 3600 THEN gap_s END AS gap_s
    FROM asof_pairs
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a tolerance window (pandas ``merge_asof(tolerance=)``
    semantics): matches further than 1 hour back are discarded — the row
    survives (left semantics) with a NULL match."""
    a = _asof_backward(spark, sf_dir)
    within = F.col("gap_s") <= 3600
    return a.select(
        "user_id",
        "buy_id",
        F.when(within, F.col("view_id")).alias("view_id"),
        "buy_ts",
        F.when(within, F.col("gap_s")).alias("gap_s"),
    )


_BANDS = [
    ("micro", 0.0, 10.0),
    ("small", 10.0, 50.0),
    ("mid", 50.0, 120.0),
    ("large", 120.0, 250.0),
    ("xl", 250.0, 500.0),
]
_BUCKET_W = 10.0

_BANDS_SQL = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _BANDS)


@query(
    "join_range_binned",
    oracle=f"""
    WITH bands(band, lo, hi) AS (VALUES {_BANDS_SQL})
    SELECT band,
           count(*)                 AS n_events,
           round(sum(value), 2)     AS sum_value,
           round(min(value), 2)     AS min_value,
           round(max(value), 2)     AS max_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY band
    """,
)
def join_range_binned(spark, sf_dir):
    """Range (interval) join, binned: events matched to irregular value
    bands via bucket equality + residual predicate instead of a raw
    non-equi join. Each band explodes to the fixed-width buckets it spans,
    so the physical plan is a hash equi-join on bucket — the shape that
    survives when BOTH sides are large (a raw `BETWEEN` join plans
    BroadcastNestedLoopJoin, O(n·m))."""
    e = T(spark, sf_dir, "events")
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    binned = bands.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / _BUCKET_W),
                F.floor(F.col("hi") / _BUCKET_W),
            )
        ),
    )
    ev = e.withColumn("bucket", F.floor(F.col("value") / _BUCKET_W))
    joined = ev.join(
        F.broadcast(binned),
        (ev["bucket"] == binned["bucket"])
        & (ev["value"] >= binned["lo"])
        & (ev["value"] < binned["hi"]),
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_events"),
        r2(F.sum("value")).alias("sum_value"),
        r2(F.min("value")).alias("min_value"),
        r2(F.max("value")).alias("max_value"),
    )


_ASOF_FWD_SQL = """
WITH views AS (
  SELECT user_id, ts, max(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
),
buys AS (
  SELECT user_id, event_id AS buy_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT b.user_id, b.buy_id, v.view_id,
       CAST(floor(epoch(b.ts)) AS BIGINT) AS buy_ts,
       CAST(floor(epoch(v.ts)) - floor(epoch(b.ts)) AS BIGINT) AS gap_s
FROM buys b ASOF LEFT JOIN views v
  ON b.user_id = v.user_id AND v.ts > b.ts
"""


@query("join_asof_forward", oracle=_ASOF_FWD_SQL)
def join_asof_forward(spark, sf_dir):
    """As-of join (forward): each purchase matched to the same user's next
    view STRICTLY after it — the post-conversion-behavior direction
    (kdb ``aj`` reversed). Same scalable shape as the backward op: union
    both event roles, ONE shuffle on user_id, and a forward-looking
    window (`first(..., ignorenulls)` over currentRow→unboundedFollowing)
    streaming each timeline once — no range join, no per-row subquery.
    Views sort before purchases at equal ts, so a same-instant view is
    correctly EXCLUDED by the strict inequality on both engines. Oracled
    against DuckDB's native forward ASOF JOIN (`v.ts > b.ts`)."""
    e = T(spark, sf_dir, "events")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("buy_id"), "ts"
    )
    tagged = views.select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        "view_id",
        F.lit(None).cast("long").alias("buy_id"),
    ).unionByName(
        buys.select(
            "user_id",
            "ts",
            F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("view_id"),
            "buy_id",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "buy_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        tagged.withColumn("nv_id", F.first("view_id", ignorenulls=True).over(w))
        .withColumn(
            "nv_ts",
            F.first(
                F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("tag") == 1)
        .select(
            "user_id",
            "buy_id",
            F.col("nv_id").alias("view_id"),
            F.col("ts").cast("long").alias("buy_ts"),
            (F.col("nv_ts").cast("long") - F.col("ts").cast("long")).alias(
                "gap_s"
            ),
        )
    )


# ---- round 7: nearest as-of (bidirectional) ------------------------------

_ASOF_NEAREST_SQL = """
WITH views AS (
  SELECT user_id, ts, max(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
),
buys AS (
  SELECT user_id, event_id AS buy_id, ts
  FROM events WHERE event_type = 'purchase'
),
bk AS (
  SELECT b.user_id, b.buy_id, v.view_id AS bk_id,
         CAST(floor(epoch(b.ts)) AS BIGINT) AS buy_ts,
         CAST(floor(epoch(v.ts)) AS BIGINT) AS bk_ts
  FROM buys b ASOF LEFT JOIN views v
    ON b.user_id = v.user_id AND v.ts <= b.ts
),
fw AS (
  SELECT b.user_id, b.buy_id, v.view_id AS fw_id,
         CAST(floor(epoch(v.ts)) AS BIGINT) AS fw_ts
  FROM buys b ASOF LEFT JOIN views v
    ON b.user_id = v.user_id AND v.ts > b.ts
)
SELECT bk.user_id, bk.buy_id, bk.buy_ts,
       CASE WHEN bk.bk_id IS NULL AND fw.fw_id IS NULL THEN NULL
            WHEN fw.fw_id IS NULL THEN bk.bk_id
            WHEN bk.bk_id IS NULL THEN fw.fw_id
            WHEN bk.buy_ts - bk.bk_ts <= fw.fw_ts - bk.buy_ts THEN bk.bk_id
            ELSE fw.fw_id END AS view_id,
       CASE WHEN bk.bk_id IS NULL AND fw.fw_id IS NULL THEN NULL
            WHEN fw.fw_id IS NULL THEN bk.bk_ts - bk.buy_ts
            WHEN bk.bk_id IS NULL THEN fw.fw_ts - bk.buy_ts
            WHEN bk.buy_ts - bk.bk_ts <= fw.fw_ts - bk.buy_ts
                 THEN bk.bk_ts - bk.buy_ts
            ELSE fw.fw_ts - bk.buy_ts END AS gap_s,
       CASE WHEN bk.bk_id IS NULL AND fw.fw_id IS NULL THEN 'none'
            WHEN fw.fw_id IS NULL THEN 'backward'
            WHEN bk.bk_id IS NULL THEN 'forward'
            WHEN bk.buy_ts - bk.bk_ts <= fw.fw_ts - bk.buy_ts
                 THEN 'backward'
            ELSE 'forward' END AS direction
FROM bk JOIN fw ON bk.user_id = fw.user_id AND bk.buy_id = fw.buy_id
"""


@query("join_asof_nearest", oracle=_ASOF_NEAREST_SQL)
def join_asof_nearest(spark, sf_dir):
    """As-of join (nearest): each purchase matched to the same user's
    CLOSEST view in either direction — min |Δt|, ties to the backward
    (at-or-before) match, the pandas ``merge_asof(direction='nearest')``
    / kdb semantics that completes the repo's as-of family
    (backward/forward/tolerance/nearest). ``gap_s`` is SIGNED
    (view_ts - buy_ts: ≤0 backward, >0 forward) and ``direction`` names
    the winning side.

    The scalable part: BOTH directional scans ride ONE tagged-union
    exchange — the backward (unboundedPreceding→current) and forward
    (current→unboundedFollowing) frames share the same partition key and
    sort order, so Catalyst plans a single user-keyed shuffle + sort with
    two running values per timeline, and the per-row chooser is pure
    projection. No second join, no range explosion — exactly the two
    sibling ops' cost, not their sum. Oracled against two native DuckDB
    ASOF JOINs composed with an identical chooser."""
    e = T(spark, sf_dir, "events")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("buy_id"), "ts"
    )
    tagged = views.select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        "view_id",
        F.lit(None).cast("long").alias("buy_id"),
    ).unionByName(
        buys.select(
            "user_id",
            "ts",
            F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("view_id"),
            "buy_id",
        )
    )
    order = ["ts", "tag", "buy_id"]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    view_ts = F.when(F.col("tag") == 0, F.col("ts"))
    scanned = (
        tagged.withColumn("bk_id", F.last("view_id", ignorenulls=True).over(wb))
        .withColumn("bk_ts", F.last(view_ts, ignorenulls=True).over(wb))
        .withColumn("fw_id", F.first("view_id", ignorenulls=True).over(wf))
        .withColumn("fw_ts", F.first(view_ts, ignorenulls=True).over(wf))
        .filter(F.col("tag") == 1)
        .select(
            "user_id",
            "buy_id",
            F.col("ts").cast("long").alias("buy_ts"),
            "bk_id",
            F.col("bk_ts").cast("long").alias("bk_ts"),
            "fw_id",
            F.col("fw_ts").cast("long").alias("fw_ts"),
        )
    )
    both_null = F.col("bk_id").isNull() & F.col("fw_id").isNull()
    back_wins = (
        F.col("fw_id").isNull()
        | (
            F.col("bk_id").isNotNull()
            & (
                F.col("buy_ts") - F.col("bk_ts")
                <= F.col("fw_ts") - F.col("buy_ts")
            )
        )
    )
    return scanned.select(
        "user_id",
        "buy_id",
        "buy_ts",
        F.when(both_null, F.lit(None).cast("long"))
        .when(back_wins, F.col("bk_id"))
        .otherwise(F.col("fw_id"))
        .alias("view_id"),
        F.when(both_null, F.lit(None).cast("long"))
        .when(back_wins, F.col("bk_ts") - F.col("buy_ts"))
        .otherwise(F.col("fw_ts") - F.col("buy_ts"))
        .alias("gap_s"),
        F.when(both_null, F.lit("none"))
        .when(back_wins, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


_SESS_GAP = 1800  # 30-min sessionization gap; also pads the interval close


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events
    ),
    sa AS (
      SELECT user_id, t, event_id,
             CASE WHEN lag(t) OVER w IS NULL
                       OR t - lag(t) OVER w > {_SESS_GAP} THEN 1 ELSE 0
             END AS is_new
      FROM ev WHERE event_type IN ('view', 'click')
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    sa2 AS (
      SELECT user_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid,
             t
      FROM sa
    ),
    ia AS (
      SELECT user_id, CAST(sid AS INT) AS a_sid, min(t) AS a_start,
             max(t) + {_SESS_GAP} AS a_end
      FROM sa2 GROUP BY user_id, sid
    ),
    sb AS (
      SELECT user_id, t, event_id,
             CASE WHEN lag(t) OVER w IS NULL
                       OR t - lag(t) OVER w > {_SESS_GAP} THEN 1 ELSE 0
             END AS is_new
      FROM ev WHERE event_type IN ('purchase', 'error')
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    sb2 AS (
      SELECT user_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid,
             t
      FROM sb
    ),
    ib AS (
      SELECT user_id, CAST(sid AS INT) AS b_sid, min(t) AS b_start,
             max(t) + {_SESS_GAP} AS b_end
      FROM sb2 GROUP BY user_id, sid
    )
    SELECT a.user_id, a.a_sid, b.b_sid, a.a_start, b.b_start,
           CAST(least(a.a_end, b.b_end)
                - greatest(a.a_start, b.b_start) AS BIGINT) AS overlap_sec,
           (b.b_start >= a.a_start AND b.b_end <= a.a_end) AS b_contained
    FROM ia a JOIN ib b
      ON a.user_id = b.user_id
     AND a.a_start <= b.b_end AND b.b_start <= a.a_end
    """,
)
def join_interval_overlap(spark, sf_dir):
    """Interval-overlap join where BOTH sides are large: browse sessions
    (view/click, 30-min-gap sessionized, padded by the gap timeout)
    overlap-joined to transaction sessions (purchase/error) of the same
    user — which purchases happened DURING an active browse session, and
    for how long the two overlapped. Completes the temporal-join family
    (as-of = nearest point, range_binned = point-in-interval, this =
    interval×interval).

    The physical shape is the scale story: a naive overlap predicate
    plans BroadcastNestedLoopJoin, O(n·m). Here each session interval
    explodes into the hour buckets it spans, the join is hash-equi on
    (user_id, bucket) with the exact overlap predicate as residual, and
    bucket-multiplicity duplicates collapse with one distinct on the
    session-pair key — the standard bin-overlap rewrite, same family as
    join_range_binned but keyed on (user, time-bucket) so BOTH inputs
    stream through a shuffle, no broadcast needed.

    Determinism: everything is exact integer-second arithmetic
    (sessionization ties break on event_id; interval bounds are
    min/max of ints).

    100 TB: sessionization rides one user-keyed window exchange;
    interval tables are sessions (≪ events); bucket fan-out is bounded
    by session span / 1 h; the overlap join shuffles on (user, bucket) —
    co-partitioned, skew-bounded by per-user-per-hour session counts."""
    e = T(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.floor(F.col("ts").cast("double")).cast("bigint").alias("t"),
    )

    def sessions(types, sid_name, start_name, end_name):
        w = Window.partitionBy("user_id").orderBy("t", "event_id")
        wc = w.rowsBetween(Window.unboundedPreceding, 0)
        f = e.filter(F.col("event_type").isin(*types))
        f = f.withColumn(
            "is_new",
            F.when(
                F.lag("t").over(w).isNull()
                | (F.col("t") - F.lag("t").over(w) > _SESS_GAP),
                F.lit(1),
            ).otherwise(F.lit(0)),
        ).withColumn("sid", F.sum("is_new").over(wc))
        return f.groupBy("user_id", "sid").agg(
            F.min("t").alias(start_name),
            (F.max("t") + _SESS_GAP).alias(end_name),
        ).select(
            "user_id",
            F.col("sid").cast("int").alias(sid_name),
            start_name,
            end_name,
        )

    ia = sessions(("view", "click"), "a_sid", "a_start", "a_end")
    ib = sessions(("purchase", "error"), "b_sid", "b_start", "b_end")
    binned_a = ia.withColumn(
        "bucket",
        F.explode(
            F.sequence(F.floor(F.col("a_start") / 3600), F.floor(F.col("a_end") / 3600))
        ),
    )
    binned_b = ib.withColumn(
        "bucket",
        F.explode(
            F.sequence(F.floor(F.col("b_start") / 3600), F.floor(F.col("b_end") / 3600))
        ),
    )
    pairs = (
        binned_a.join(binned_b, ["user_id", "bucket"])
        .filter(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
        )
        .select(
            "user_id", "a_sid", "b_sid", "a_start", "a_end", "b_start", "b_end"
        )
        .distinct()
    )
    return pairs.select(
        "user_id",
        "a_sid",
        "b_sid",
        "a_start",
        "b_start",
        (
            F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
        ).cast("bigint").alias("overlap_sec"),
        (
            (F.col("b_start") >= F.col("a_start"))
            & (F.col("b_end") <= F.col("a_end"))
        ).alias("b_contained"),
    )
