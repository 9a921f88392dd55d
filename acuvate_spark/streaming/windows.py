"""Watermarked tumbling-window aggregation over an event stream — the
idiomatic superset SURVEY §2.9 calls for (the reference has no
event-time semantics; its daily 05:00 sync becomes an AvailableNow
job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def windowed_counts(
    stream: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, hopping) window counts with a
    late-data watermark. Same logical result as the batch twins
    queries.core.tumbling_event_counts / sliding_event_counts — the
    batch/stream parity is asserted in tests/test_streaming.py."""
    win = F.window("ts", window_len, slide) if slide else F.window("ts", window_len)
    # value carries exactly two decimals: summing exact integer cents
    # keeps the incremental aggregation associative (a float sum flips
    # its last cent with merge order), matching the batch twins.
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("decimal(25,0)")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(cents).cast("double") / 100, 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def stream_events_from_json(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source event stream (JSON lines) with an explicit schema —
    schema inference is disabled on streams for good reason."""
    tune(spark)
    return spark.readStream.schema(EVENT_SCHEMA).json(input_dir)


def run_daily_sync(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """The 05:00-EST daily sync (reference sync_tags app.py:6631-6740 +
    APScheduler cron app.py:6744-6749) as a Trigger.AvailableNow-style
    batch job: run the UNION-ALL sync query and write the batch to the
    REST-sink staging directory. Returns the row count written
    (the reference logs the same). Scheduling is the platform's
    concern (cron/Airflow); the job itself is idempotent per day."""
    from ..queries import REGISTRY

    df = REGISTRY["union_all_sync"].fn(spark, sf_dir)
    df.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir).count()


def click_purchase_attribution(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream inner join: attribute each purchase to the same
    user's clicks in the preceding hour. Both sides carry watermarks so
    the join state is EVICTABLE — the time-range predicate bounds how
    long a click must be retained (watermark + 1 h horizon), which is
    what makes a stream-stream join runnable indefinitely; without the
    range condition Spark would have to keep every click forever. The
    batch twin is the registered ``click_attribution`` query; the
    parity test asserts the emitted pair set matches it exactly."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", "2 hours")
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    ).withWatermark("purchase_ts", "2 hours")
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
    )
