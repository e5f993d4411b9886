"""Segment statistics: daily + cumulative per-segment rollups.

Reference: CreateSegments (transform/create_segments.py:20-73) — per seg_id,
per day, emit the day's last fragment with daily/cumulative msg counts and
counted-identity arrays. Here it's 100% Catalyst: window functions for the
running totals (reference's procedural loop), explode + re-collect for the
counted-value arrays. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def create_segments(fragments_with_seg: DataFrame) -> DataFrame:
    """Input: fragment rows + seg_id. Output: one row per (seg_id, day)."""
    f = fragments_with_seg.withColumn("date", F.to_date("timestamp"))

    daily = f.groupBy("seg_id", "doc_id", "date").agg(
        F.max_by("frag_id", F.col("first_msg_timestamp")).alias("frag_id"),
        F.max("timestamp").alias("timestamp"),
        F.sum("msg_count").alias("daily_msg_count"),
        F.min("first_msg_timestamp").alias("__day_first_ts"),
        F.flatten(F.collect_list("identities")).alias("__day_idents"),
    )

    w_cum = (
        Window.partitionBy("seg_id")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    daily = daily.withColumn(
        "cumulative_msg_count", F.sum("daily_msg_count").over(w_cum)
    ).withColumn("first_timestamp", F.min("__day_first_ts").over(w_cum))

    # counted-identity rollups: explode -> per-(seg, value) daily sums ->
    # running window sums -> re-collect sorted arrays
    idents = (
        daily.select("seg_id", "date", F.explode("__day_idents").alias("i"))
        .groupBy("seg_id", "date", F.col("i.value").alias("value"))
        .agg(F.sum("i.count").alias("cnt"))
    )
    w_val = (
        Window.partitionBy("seg_id", "value")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    idents = idents.withColumn("cum_cnt", F.sum("cnt").over(w_val))
    daily_arr = idents.groupBy("seg_id", "date").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("value"), F.col("cnt").alias("count")))
        ).alias("daily_identities")
    )
    # cumulative arrays must include values seen on PRIOR days even if absent
    # today. Linear plan (not a days x value-dates inequality join, which is
    # quadratic in segment lifetime): scaffold (seg, day) x distinct value,
    # forward-fill the running count with last(ignoreNulls) over a
    # (seg, value) window ordered by date, drop rows before a value's first
    # appearance, re-collect. Scaffold cardinality == output cardinality, so
    # this is optimal for the materialized-array format even at 100x scale.
    days = daily.select("seg_id", "date")
    vals = idents.select("seg_id", "value").distinct()
    w_ff = (
        Window.partitionBy("seg_id", "value")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_arr = (
        days.join(vals, "seg_id")
        .join(
            idents.select("seg_id", "value", "date", "cum_cnt"),
            ["seg_id", "value", "date"],
            "left",
        )
        .withColumn("count", F.last("cum_cnt", ignorenulls=True).over(w_ff))
        .where(F.col("count").isNotNull())
        .groupBy("seg_id", "date")
        .agg(
            F.sort_array(F.collect_list(F.struct("value", "count"))).alias(
                "cumulative_identities"
            )
        )
    )

    out = (
        daily.join(daily_arr, ["seg_id", "date"], "left")
        .join(cum_arr, ["seg_id", "date"], "left")
        .select(
            "seg_id",
            "frag_id",
            "doc_id",
            "timestamp",
            "first_timestamp",
            "daily_msg_count",
            "cumulative_msg_count",
            F.coalesce("daily_identities", F.array()).alias("daily_identities"),
            F.coalesce("cumulative_identities", F.array()).alias(
                "cumulative_identities"
            ),
        )
    )
    return out
