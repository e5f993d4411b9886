"""Streaming identity joins (reference segment_identity stage, SURVEY §3.2):
stream-static refresh semantics and stream-stream watermarked range join."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from pipe_segment_spark.streaming.identity_join import (
    join_identity_static,
    join_identity_stream,
)

SEG_SCHEMA = "doc_id string, timestamp timestamp, seg_id string"
IDENT_SCHEMA = (
    "doc_id string, summary_timestamp timestamp, shipname string, callsign string"
)

T0 = dt.datetime(2024, 1, 10)


def _mk_stream(spark, tmp_path, name, schema, rows):
    d = os.path.join(str(tmp_path), name)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(d)
    return spark.readStream.schema(schema).parquet(d)


def test_stream_static_join(spark, tmp_path):
    seg_stream = _mk_stream(
        spark,
        tmp_path,
        "segs",
        SEG_SCHEMA,
        [("d1", T0, "s1"), ("d2", T0, "s2")],
    )
    identity = spark.createDataFrame(
        [("d1", T0 - dt.timedelta(days=1), "VESSEL A", "CA")], IDENT_SCHEMA
    )
    out_dir = os.path.join(str(tmp_path), "out")
    q = (
        join_identity_static(seg_stream, identity)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r["doc_id"]: r["shipname"] for r in spark.read.parquet(out_dir).collect()}
    assert rows == {"d1": "VESSEL A", "d2": None}


def test_stream_stream_range_join(spark, tmp_path):
    seg_stream = _mk_stream(
        spark,
        tmp_path,
        "segs",
        SEG_SCHEMA,
        [("d1", T0, "s1"), ("d1", T0 + dt.timedelta(days=30), "s2")],
    )
    ident_stream = _mk_stream(
        spark,
        tmp_path,
        "idents",
        IDENT_SCHEMA,
        [
            ("d1", T0 - dt.timedelta(days=2), "VESSEL A", "CA"),  # in window for s1
            ("d1", T0 - dt.timedelta(days=20), "OLD NAME", "CX"),  # stale
        ],
    )
    out_dir = os.path.join(str(tmp_path), "out")
    q = (
        join_identity_stream(seg_stream, ident_stream, validity_days=7)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r["seg_id"], r["shipname"]) for r in spark.read.parquet(out_dir).collect()
    )
    # s1 matches only the in-window identity; s2 (30 days later) matches none
    assert ("s1", "VESSEL A") in rows
    assert ("s1", "OLD NAME") not in rows
