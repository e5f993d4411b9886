"""Cold-start state bootstrap (reference ReadFragments, SURVEY §2.1 S3):
historical open segments seed the streaming state so day-1 fragments merge
into pre-existing segments instead of opening new ones."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from pipe_segment_spark.streaming.segmenter_stream import seed_rows_from_fragments
from pipe_segment_spark.streaming.sink import read_sink

from tests.test_streaming import INPUT_SCHEMA, _await, _run_stream

T0 = dt.datetime(2024, 5, 10, 12, 0, 0)


def test_seed_merges_into_historical_segment(spark, tmp_path):
    # historical fragment: open segment whose last record is 3h before the
    # first new record (inside the max_gap_hours=6 match window)
    hist = spark.createDataFrame(
        [
            (
                "d1",
                "histfrag-1",
                "histseg-1",
                T0 - dt.timedelta(hours=3),
                10,
            )
        ],
        "doc_id string, frag_id string, seg_id string, "
        "last_msg_timestamp timestamp, last_msg_n_tok int",
    )
    seeds = seed_rows_from_fragments(hist)

    # today's records: close to the historical boundary -> should MERGE
    today = spark.createDataFrame(
        [
            ("d1", "s", T0, [10, 11], 10, "m0", "POS", None),
            ("d1", "s", T0 + dt.timedelta(hours=1), [11, 12], 11, "m1", "POS", None),
            # next day far away in token space -> new segment
            ("d1", "s", T0 + dt.timedelta(days=2), [90, 91], 90, "m2", "POS", None),
        ],
        INPUT_SCHEMA,
    )

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    seeds.unionByName(today).coalesce(1).write.parquet(
        os.path.join(in_dir, "feed_0")
    )
    # a later feed advances the watermark so earlier days close
    spark.createDataFrame(
        [("d1", "s", T0 + dt.timedelta(days=4), [90, 91], 90, "m3", "POS", None)],
        INPUT_SCHEMA,
    ).coalesce(1).write.parquet(os.path.join(in_dir, "feed_1"))

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = _run_stream(spark, in_dir, out_dir, ckpt)
    _await(q)
    q = _run_stream(spark, in_dir, out_dir, ckpt)
    _await(q)

    segmap = {
        r["frag_id"]: r["seg_id"]
        for r in read_sink(spark, out_dir).where(F.col("kind") == "segmap").collect()
    }
    day1_frags = [f for f in segmap if f.startswith("d1-") and "m" not in f]
    # the day-1 fragment (containing m0/m1) joined the historical segment
    merged = [s for s in segmap.values() if s == "histseg-1"]
    assert merged, segmap
    # the far-away fragment opened its own segment
    assert any(s != "histseg-1" for s in segmap.values()), segmap
