"""Time-series operators: as-of join over the `events` table.

The reference has no time notion at all (SURVEY.md §2.3); an as-of join is
the canonical time-series operator Spark lacks as a built-in relational
operator. Implemented as a composition of existing DataFrame ops (SURVEY.md
§2.3 disposition: composition first, Pandas UDF only if semantics demand it):

    union(tagged right, tagged left)
      -> window per join key ordered by (ts, tag)
      -> last(right payload, ignorenulls) over rows-unbounded-preceding
      -> keep left rows

This is the scalable formulation: ONE shuffle on the join key (the window
exchange), no range-condition fan-out, no per-key driver loop. A sort-merge
range join would re-shuffle both sides and explode on hot keys; the tagged
union sorts each key's timeline once. At 100 TB the shuffle is keyed by
user_id (high cardinality, well spread) and state per task is one row (the
running "last right payload") — the same shape Structured Streaming uses for
stream-stream as-of alignment.

The tag orders right rows before left rows at equal timestamps, matching the
inclusive `l.ts >= r.ts` semantics of DuckDB's native ASOF JOIN, which is the
oracle. Right rows are first deduplicated to one per (key, ts) — max event_id
wins — so equal-timestamp ties are deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parallel_mapreduce_spark.registry import query
from parallel_mapreduce_spark.sources import load_table, register_views


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_payload: tuple[str, ...] = (),
) -> DataFrame:
    """Generic as-of join: for every left row, attach the latest right row
    with ``right.ts <= left.ts`` within the same ``on`` key.

    Right payload columns come back as ``asof_<name>`` (nullable — left rows
    with no preceding right row keep nulls) plus ``asof_ts``. Right must be
    unique per (on, ts); callers pre-aggregate duplicates so tie-breaks are
    deterministic.
    """
    l_tag = left.withColumn("_tag", F.lit(1))
    r_tag = right.withColumn("_tag", F.lit(0))
    # Align schemas: each side gets the other's missing columns as nulls.
    for c, t in l_tag.dtypes:
        if c not in dict(r_tag.dtypes):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(t))
    for c, t in r_tag.dtypes:
        if c not in dict(l_tag.dtypes):
            l_tag = l_tag.withColumn(c, F.lit(None).cast(t))
    u = r_tag.unionByName(l_tag.select(*r_tag.columns))
    w = (
        W.partitionBy(on)
        .orderBy(ts, "_tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    payload: Column = F.struct(
        F.col(ts).alias("asof_ts"),
        *[F.col(c).alias(f"asof_{c}") for c in right_payload],
    )
    matched = u.withColumn(
        "_m", F.last(F.when(F.col("_tag") == 0, payload), ignorenulls=True).over(w)
    )
    out_cols = [c for c in left.columns] + [
        F.col("_m.asof_ts").alias("asof_ts"),
        *[F.col(f"_m.asof_{c}").alias(f"asof_{c}") for c in right_payload],
    ]
    return matched.filter(F.col("_tag") == 1).select(*out_cols)


# --------------------------------------------------------------------------
# As-of join instance: attribute each purchase event to the user's latest
# preceding click (inclusive at equal timestamps). Oracle: DuckDB's native
# ASOF LEFT JOIN.
# --------------------------------------------------------------------------
@query(
    "asof_purchase_attribution",
    oracle="""
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), r AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    )
    SELECT l.event_id AS purchase_id,
           l.user_id,
           CAST(epoch(date_trunc('second', l.ts)) AS BIGINT) AS ts_epoch,
           r.click_id,
           CAST(date_diff('second', r.ts, l.ts) AS BIGINT) AS gap_s
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    right = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    joined = asof_join(left, right, on="user_id", ts="ts", right_payload=("click_id",))
    return joined.select(
        "purchase_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.col("asof_click_id").alias("click_id"),
        (F.unix_timestamp("ts") - F.unix_timestamp("asof_ts"))
        .cast("long")
        .alias("gap_s"),
    )
