"""Salted vs unsalted equivalence (SURVEY.md §7 Phase 4): the physical
rewrite for hot keys must be row-identical, including under a planted
hot-key distribution."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pipe_segment_spark.config import SegmenterParams
from pipe_segment_spark.operators.fragment import tag_fragments
from pipe_segment_spark.plans.salting import tag_fragments_salted
from pipe_segment_spark.sources.token_stream import token_stream

from tests.conftest import SF_DIR

PARAMS = SegmenterParams()


def _collect(df):
    return sorted(
        (r["msgid"], r["frag_id"], tuple(r["tokens"] or []))
        for r in df.collect()
    )


def test_salted_equals_unsalted_sf(spark):
    records = token_stream(spark, SF_DIR)
    assert _collect(tag_fragments(records, PARAMS)) == _collect(
        tag_fragments_salted(records, PARAMS)
    )


def test_salted_equals_unsalted_hot_key(spark):
    """One doc_id holding ~50% of rows (FIXTURES.md F1 scenario 9)."""
    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(2000):
        doc = "hot" if i % 2 == 0 else f"d{i % 7}"
        ts = base + dt.timedelta(minutes=7 * i)
        rows.append((doc, "s", ts, [i % 50, i % 50 + 1], i % 97 + 1, f"m{i:05d}", "POS", None))
    df = spark.createDataFrame(
        rows,
        "doc_id string, source string, timestamp timestamp, tokens array<int>, "
        "n_tok int, msgid string, rec_type string, ident_value string",
    )
    assert _collect(tag_fragments(df, PARAMS)) == _collect(
        tag_fragments_salted(df, PARAMS, days_per_salt=1)
    )
    # wider salt buckets too
    assert _collect(tag_fragments(df, PARAMS)) == _collect(
        tag_fragments_salted(df, PARAMS, days_per_salt=3)
    )
