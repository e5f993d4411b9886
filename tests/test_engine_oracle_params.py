"""The recursive-CTE oracle is parameterized by SegmenterParams — verify it
tracks the engine under NON-default thresholds (tighter gap/rate, small
max_open_fragments), not just the registered DEFAULT_PARAMS queries."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pipe_segment_spark.config import SegmenterParams
from pipe_segment_spark.pipeline import run_batch_pipeline
from pipe_segment_spark.queries.engine_oracle import (
    oracle_full_segments,
    oracle_full_tagged,
)
from pipe_segment_spark.queries.engine_q import _ident_str
from pipe_segment_spark.sources.token_stream import token_stream

from tests.conftest import SF_DIR
from tests.driver_mimic import compare, duck_con


@pytest.mark.parametrize(
    "params",
    [
        SegmenterParams(max_gap_hours=2.0, max_dtok_rate=10.0),
        SegmenterParams(max_open_fragments=2, match_window_hours=12.0),
    ],
    ids=["tight-thresholds", "tiny-state-short-window"],
)
def test_recursive_oracle_tracks_params(spark, params):
    def q_segments(spark, sf_dir):
        out = run_batch_pipeline(token_stream(spark, sf_dir), params)
        return out.segments.select(
            "seg_id",
            "frag_id",
            "doc_id",
            "timestamp",
            "first_timestamp",
            "daily_msg_count",
            "cumulative_msg_count",
            _ident_str("daily_identities").alias("daily_identities_s"),
            _ident_str("cumulative_identities").alias(
                "cumulative_identities_s"
            ),
            _ident_str("daily_destinations").alias("daily_destinations_s"),
            _ident_str("cumulative_destinations").alias(
                "cumulative_destinations_s"
            ),
        )

    def q_tagged(spark, sf_dir):
        out = run_batch_pipeline(token_stream(spark, sf_dir), params)
        return out.tagged_records.select(
            "doc_id",
            "timestamp",
            "msgid",
            F.array_join("tokens", ",").alias("tokens_s"),
            "frag_id",
            "seg_id",
        )

    con = duck_con(SF_DIR)
    for name, fn, sql in [
        ("segments", q_segments, oracle_full_segments(params)),
        ("tagged", q_tagged, oracle_full_tagged(params)),
    ]:
        r = compare(spark, con, name, fn, sql, SF_DIR, verbose=False)
        assert r["status"] == "OK", (name, r["status"])
