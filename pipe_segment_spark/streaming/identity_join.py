"""Stateful joins of the segment stream against identity data.

Reference: the segment_identity stage (segment_identity/pipeline.py:344-362)
joins segments with fragments/identity summaries as a daily batch. Streaming
recast (north_star: "stateful stream-stream joins of segment state against a
slowly-changing identity side-input"):

1. ``join_identity_static`` — stream-static join: the identity table is
   re-read every microbatch (Spark re-plans stream-static joins per batch,
   so a slowly-changing table picks up updates without restart). Broadcast
   decision is AQE's.

2. ``join_identity_stream`` — stream-stream LEFT OUTER join with watermarks
   on both sides and an event-time range condition: a segment row matches
   identity rows whose validity start falls within the preceding
   ``validity_days`` — the watermark bounds the join state exactly as
   Spark requires for state cleanup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_identity_static(segments_stream: DataFrame, identity: DataFrame) -> DataFrame:
    """Stream-static left join on doc_id (identity = slowly-changing lookup,
    reference's AsDict side-input pattern, filter_bad_satellite_times.py:43-46)."""
    ident = identity.select(
        "doc_id",
        F.col("summary_timestamp").alias("ident_since"),
        "shipname",
        "callsign",
    )
    return segments_stream.join(ident, "doc_id", "left")


def join_identity_stream(
    segments_stream: DataFrame,
    identity_stream: DataFrame,
    watermark: str = "1 day",
    validity_days: int = 7,
) -> DataFrame:
    """Stream-stream left-outer join with watermarks + event-time range.

    Both sides carry watermarks so Spark can age out join state; the range
    predicate bounds how long an identity row stays joinable (its validity
    window), mirroring the reference's per-day identity summaries.
    """
    seg = segments_stream.withWatermark("timestamp", watermark)
    ident = (
        identity_stream.select(
            F.col("doc_id").alias("i_doc_id"),
            F.col("summary_timestamp"),
            "shipname",
            "callsign",
        ).withWatermark("summary_timestamp", watermark)
    )
    cond = (
        (seg["doc_id"] == ident["i_doc_id"])
        & (ident["summary_timestamp"] <= seg["timestamp"])
        & (
            ident["summary_timestamp"]
            >= seg["timestamp"] - F.expr(f"INTERVAL {validity_days} DAYS")
        )
    )
    return seg.join(ident, cond, "leftOuter").drop("i_doc_id")
