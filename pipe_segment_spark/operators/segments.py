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


def _rollup_counted(daily: DataFrame):
    """Both counted arrays -> one (seg_id, date) df with the four array
    columns, in a SINGLE fused pipeline (one explode, one aggregation tree,
    one forward-fill window — not per-array).

    Cumulative arrays must include values seen on PRIOR days even if absent
    today. Linear plan (not a days x value-dates inequality join, which is
    quadratic in segment lifetime): scaffold (seg, day) x distinct
    (kind, value), forward-fill the running count with last(ignoreNulls)
    over a (seg, kind, value) window ordered by date, drop rows before a
    value's first appearance, re-collect conditionally per kind. Scaffold
    cardinality == output cardinality, so this is optimal for the
    materialized-array format even at 100x scale.
    """
    kinds = F.array(
        *[
            F.struct(
                F.lit(src).alias("kind"), F.col(f"__day_{src}").alias("arr")
            )
            for src, _, _ in COUNTED_ARRAYS
        ]
    )
    vals = (
        daily.select("seg_id", "date", F.explode(kinds).alias("k"))
        .select("seg_id", "date", "k.kind", F.explode("k.arr").alias("i"))
        .groupBy("seg_id", "date", "kind", F.col("i.value").alias("value"))
        .agg(F.sum("i.count").alias("cnt"))
    )
    w_val = (
        Window.partitionBy("seg_id", "kind", "value")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vals = vals.withColumn("cum_cnt", F.sum("cnt").over(w_val))

    def collect_arr(kind: str, count_col, out_col: str):
        return F.sort_array(
            F.collect_list(
                F.when(
                    F.col("kind") == kind,
                    F.struct(F.col("value"), count_col.alias("count")),
                )
            )
        ).alias(out_col)

    daily_arr = vals.groupBy("seg_id", "date").agg(
        *[
            collect_arr(src, F.col("cnt"), daily_col)
            for src, daily_col, _ in COUNTED_ARRAYS
        ]
    )
    days = daily.select("seg_id", "date")
    distinct_vals = vals.select("seg_id", "kind", "value").distinct()
    cum_arr = (
        days.join(distinct_vals, "seg_id")
        .join(
            vals.select("seg_id", "kind", "value", "date", "cum_cnt"),
            ["seg_id", "kind", "value", "date"],
            "left",
        )
        .withColumn("count", F.last("cum_cnt", ignorenulls=True).over(w_val))
        .where(F.col("count").isNotNull())
        .groupBy("seg_id", "date")
        .agg(
            *[
                collect_arr(src, F.col("count"), cum_col)
                for src, _, cum_col in COUNTED_ARRAYS
            ]
        )
    )
    return daily_arr, cum_arr


def create_segments(fragments_with_seg: DataFrame) -> DataFrame:
    """Input: fragment rows + seg_id. Output: one row per (seg_id, day).

    Physical shape (r6): ONE explicit hash exchange on seg_id up front.
    Every aggregation / window / join below keys on a seg_id-prefixed set,
    and HashPartitioning(seg_id) satisfies ClusteredDistribution(keys)
    whenever seg_id is among the keys — so the whole rollup (daily agg,
    cumulative windows, the counted-array scaffold joins) runs without any
    further Exchange (guide §2.4: share one exchange across same-keyed
    operations). The shared exchange is also the reuse point for the four
    plan branches that hang off ``daily`` — pre-r6 each branch re-derived
    the un-persisted fragment/array-attach subtree (plan-measured: 39
    Exchanges and a 4x attach recompute in the flagship plan; 1 exchange +
    local sorts after). Partitioning by seg_id alone is balanced at any
    scale: segments are bounded in lifetime (days), so per-seg row counts
    are small and the key space grows with the data."""
    f = fragments_with_seg.withColumn("date", F.to_date("timestamp"))
    f = f.repartition("seg_id")

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

    daily_arr, cum_arr = _rollup_counted(daily)
    out = daily.join(daily_arr, ["seg_id", "date"], "left").join(
        cum_arr, ["seg_id", "date"], "left"
    )
    arr_cols = []
    for _, daily_col, cum_col in COUNTED_ARRAYS:
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
