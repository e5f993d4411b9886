"""Segment statistics: daily + cumulative per-segment rollups.

Reference: CreateSegments (transform/create_segments.py:20-73) — per seg_id,
per day, emit the day's last fragment with daily/cumulative msg counts and
counted-value arrays (both 'identities' and 'destinations',
transform/fragment.py:24-72). Here it's 100% Catalyst: window functions for
the running totals (reference's procedural loop), explode + re-collect for
the counted-value arrays. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (fragment array column, daily output column, cumulative output column)
COUNTED_ARRAYS = [
    ("identities", "daily_identities", "cumulative_identities"),
    ("destinations", "daily_destinations", "cumulative_destinations"),
]


def _rollup_counted(daily: DataFrame, src_col: str, daily_col: str, cum_col: str):
    """One counted array -> (daily arrays df, cumulative arrays df).

    Cumulative arrays must include values seen on PRIOR days even if absent
    today. Linear plan (not a days x value-dates inequality join, which is
    quadratic in segment lifetime): scaffold (seg, day) x distinct value,
    forward-fill the running count with last(ignoreNulls) over a
    (seg, value) window ordered by date, drop rows before a value's first
    appearance, re-collect. Scaffold cardinality == output cardinality, so
    this is optimal for the materialized-array format even at 100x scale.
    """
    vals = (
        daily.select("seg_id", "date", F.explode(f"__day_{src_col}").alias("i"))
        .groupBy("seg_id", "date", F.col("i.value").alias("value"))
        .agg(F.sum("i.count").alias("cnt"))
    )
    w_val = (
        Window.partitionBy("seg_id", "value")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vals = vals.withColumn("cum_cnt", F.sum("cnt").over(w_val))
    daily_arr = vals.groupBy("seg_id", "date").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("value"), F.col("cnt").alias("count")))
        ).alias(daily_col)
    )
    days = daily.select("seg_id", "date")
    distinct_vals = vals.select("seg_id", "value").distinct()
    w_ff = (
        Window.partitionBy("seg_id", "value")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_arr = (
        days.join(distinct_vals, "seg_id")
        .join(
            vals.select("seg_id", "value", "date", "cum_cnt"),
            ["seg_id", "value", "date"],
            "left",
        )
        .withColumn("count", F.last("cum_cnt", ignorenulls=True).over(w_ff))
        .where(F.col("count").isNotNull())
        .groupBy("seg_id", "date")
        .agg(
            F.sort_array(F.collect_list(F.struct("value", "count"))).alias(
                cum_col
            )
        )
    )
    return daily_arr, cum_arr


def create_segments(fragments_with_seg: DataFrame) -> DataFrame:
    """Input: fragment rows + seg_id. Output: one row per (seg_id, day)."""
    f = fragments_with_seg.withColumn("date", F.to_date("timestamp"))

    daily = f.groupBy("seg_id", "doc_id", "date").agg(
        F.max_by("frag_id", F.col("first_msg_timestamp")).alias("frag_id"),
        F.max("timestamp").alias("timestamp"),
        F.sum("msg_count").alias("daily_msg_count"),
        F.min("first_msg_timestamp").alias("__day_first_ts"),
        *[
            F.flatten(F.collect_list(src)).alias(f"__day_{src}")
            for src, _, _ in COUNTED_ARRAYS
        ],
    )

    w_cum = (
        Window.partitionBy("seg_id")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    daily = daily.withColumn(
        "cumulative_msg_count", F.sum("daily_msg_count").over(w_cum)
    ).withColumn("first_timestamp", F.min("__day_first_ts").over(w_cum))

    out = daily
    arr_cols = []
    for src, daily_col, cum_col in COUNTED_ARRAYS:
        daily_arr, cum_arr = _rollup_counted(daily, src, daily_col, cum_col)
        out = out.join(daily_arr, ["seg_id", "date"], "left").join(
            cum_arr, ["seg_id", "date"], "left"
        )
        arr_cols += [
            F.coalesce(daily_col, F.array()).alias(daily_col),
            F.coalesce(cum_col, F.array()).alias(cum_col),
        ]

    return out.select(
        "seg_id",
        "frag_id",
        "doc_id",
        "timestamp",
        "first_timestamp",
        "daily_msg_count",
        "cumulative_msg_count",
        *arr_cols,
    )
