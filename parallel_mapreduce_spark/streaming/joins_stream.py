"""Stream-stream join: click→purchase attribution over two event streams.

Completes the streaming surface's join kind (windowed agg, stateful,
dedup-within-watermark already exist): two streams of the same source,
inner-joined on user with an event-time range predicate. Structured
Streaming buffers each side's rows in state until the other side's
watermark passes the join window — the time-bound condition is what makes
the state BOUNDED (an unconstrained stream-stream equi-join would buffer
both streams forever), which is the whole 100 TB/day story for this
operator.

Oracle: the identical join expressed as batch SQL over the same table —
for an availableNow run that drains the source, streaming append output
equals the batch join exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_mapreduce_spark.registry import query
from parallel_mapreduce_spark.session import apply_runtime_conf
from parallel_mapreduce_spark.streaming.events_stream import EVENTS_SCHEMA, decode_ts

ATTRIBUTION_WINDOW_S = 1800  # purchase within 30 min of the click


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
        .withColumn("ts", decode_ts())
    )


def click_purchase_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """(user_id, click_id, purchase_id, gap_s) pairs where the purchase lands
    in [click_ts, click_ts + ATTRIBUTION_WINDOW_S]."""
    apply_runtime_conf(spark)
    clicks = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (clicks.user_id == purchases.p_user_id)
        & (purchases.purchase_ts >= clicks.click_ts)
        & (
            purchases.purchase_ts
            <= clicks.click_ts + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS")
        )
    )
    return clicks.join(purchases, cond, "inner").select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts"))
        .cast("long")
        .alias("gap_s"),
    )


_RUN_SEQ = 0


@query(
    "stream_click_attribution",
    oracle=f"""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_s
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-shot (availableNow) run of the stream-stream join into a memory
    sink. Append mode: a joined pair is emitted once both inputs are
    buffered; draining the source flushes every matched pair, so the result
    equals the batch join."""
    global _RUN_SEQ
    _RUN_SEQ += 1
    name = f"stream_click_attribution_{_RUN_SEQ}"
    q = (
        click_purchase_stream(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
