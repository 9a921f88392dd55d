"""Time-series resampling queries (SURVEY.md §2.13 T65).

The reference's daily-sync endpoints work on already-regular data; a
real telemetry/metrics corpus is irregular, and the first step of any
downstream aggregation is resampling onto a fixed grid with an
explicit policy for empty buckets. `gapfill_daily` is that operator:
per-key calendar densification + forward fill, the batch analogue of
Structured Streaming's tumbling windows with state carry-over.

Same design rules as the rest of the registry: declarative DataFrame
plans only, integer (cents) arithmetic so the oracle hashes exactly,
and the 100 TB shuffle story in the docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load_table, repartition_for_compute
from .registry import register


@register(
    "gapfill_daily",
    oracle="""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN abs(value) < 9e13
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2
),
span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM span
)
SELECT g.user_id, g.day,
       CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events,
       d.n_events IS NULL AS gap,
       CAST(last_value(d.value_cents IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ff_value_cents
FROM grid g LEFT JOIN daily d USING (user_id, day)
""",
    survey_ref="time-series: calendar gap-fill + forward fill (resample "
    "onto a fixed grid; batch twin of stateful tumbling windows)",
)
def gapfill_daily(spark, sf_dir):
    """Per-user daily resample with gap-fill and forward fill: sum each
    user's event values into calendar days, densify every user's
    [first_day, last_day] span via ``sequence(...interval 1 day)`` +
    explode, and carry the last observed daily sum across empty days
    with ``last(value, ignorenulls)`` — the standard resample /
    forward-fill pair (pandas ``resample().ffill()``) expressed as a
    distributed plan.

    100 TB story: the daily pre-aggregation is a partial-agg shuffle on
    (user_id, day) — raw events combine map-side, so the shuffle
    carries one row per user-day, not per event. The grid explode is
    narrow (span endpoints come from a per-user agg over the SAME
    reduced frame). The window is partitioned BY USER over a
    calendar-bounded frame (days in the observed span), so no
    single-partition funnel exists at any corpus size: per-task state
    is O(days), not O(events). Values aggregate in integer cents
    (``floor(x*100+0.5)``, the repo's portable-rounding idiom) so the
    oracle hashes exactly.
    """
    ev = repartition_for_compute(load_table(spark, sf_dir, "events"))
    return gapfill_frame(ev)


def gapfill_frame(ev):
    """The gapfill_daily plan over an arbitrary events frame (ts,
    user_id, value) — shared by the registry query and the late-data
    reconciliation job so 'batch truth' is one definition."""
    day = F.date_trunc("day", F.col("ts"))
    # guarded exact-cents domain (see queries.core._cents): out-of-domain
    # values (non-finite, |x| >= 9e13) have no well-defined cents — NULL,
    # not Spark's silent floor->long saturation (ANSI long-sum overflow
    # crash on Inf, NaN folded to 0; r14 extreme-value ring)
    cents = F.when(F.abs(F.col("value")) < 9e13, F.floor(F.col("value") * 100 + 0.5)).cast(
        "long"
    )
    daily = ev.groupBy(F.col("user_id"), day.alias("day")).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(cents).cast("long").alias("value_cents"),
    )
    span = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.col("n_events").isNull().alias("gap"),
        F.last("value_cents", ignorenulls=True).over(w).cast("long").alias("ff_value_cents"),
    )


def gapfill_corrections(events, late_events):
    """The BATCH half of the forward-fill lambda split (VERDICT r05
    item 5). The streaming twin (``streaming.stateful
    .daily_forward_fill``) runs in append mode, so it DROPS events at
    or below a user's last emitted day to keep its state monotone —
    'batch is truth' for late arrivals. This job recomputes that
    truth for exactly the affected (user, day) ranges: users with a
    late arrival, over their full observed span from storage (the
    whole span, because a late day shifts every downstream
    forward-fill until the next observed day, and can extend the grid
    backwards past the stream's first emitted day).

    100 TB story: ``late_events`` is the stream's dropped-row side
    channel — tiny by construction — so the affected-user set
    broadcasts into a semi-join that prunes the full-log scan before
    the (user_id, day) partial agg; unaffected users (the overwhelming
    majority) are never recomputed."""
    affected = late_events.select("user_id").distinct()
    return gapfill_frame(events.join(F.broadcast(affected), "user_id", "left_semi"))


def merge_corrections(stream_out, corrections):
    """Stream + corrections == batch truth: correction rows take
    precedence per (user_id, day); stream rows for corrected days are
    replaced via a left-anti join on the key, and days only the
    corrections know about (a late event extending a user's span) are
    added by the union. No window, no shuffle beyond the key."""
    return corrections.unionByName(
        stream_out.join(
            corrections.select("user_id", "day"), ["user_id", "day"], "left_anti"
        )
    )
