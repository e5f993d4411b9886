"""Cross-window greedy fragment->segment matcher.

Reference: CreateSegmentMap (transform/create_segment_map.py:84-147) — a
per-key day-ordered greedy assignment carrying open-segment state forward.
Inherently per-key sequential; parallel across keys via ``groupBy(doc_id)
.applyInPandas`` (the reference uses GroupByKey(ssvid) the same way,
pipeline.py:244-249).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipe_segment_spark.config import DEFAULT_PARAMS, SegmenterParams
from pipe_segment_spark.operators.kernel import greedy_merge

SEGMAP_SCHEMA = "doc_id string, date date, seg_id string, frag_id string"


def create_segment_map(
    fragments: DataFrame, params: SegmenterParams = DEFAULT_PARAMS
) -> DataFrame:
    """fragments -> (doc_id, date, seg_id, frag_id) assignment map.

    The map is tiny relative to records (1 row per fragment) — downstream
    joins against it broadcast (reference fans it out over time bins instead,
    pipeline.py:252-261).
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = pdf["doc_id"].iloc[0]
        frags = pd.DataFrame(
            {
                "frag_id": pdf["frag_id"],
                "date": pdf["timestamp"].dt.date,
                "first_us": pdf["first_msg_timestamp"]
                .to_numpy("datetime64[us]")
                .astype("int64"),
                "last_us": pdf["last_msg_timestamp"]
                .to_numpy("datetime64[us]")
                .astype("int64"),
                "first_n_tok": pdf["first_msg_n_tok"],
                "last_n_tok": pdf["last_msg_n_tok"],
            }
        )
        out, _ = greedy_merge(doc_id, frags, params)
        return out

    cols = [
        "doc_id",
        "frag_id",
        "timestamp",
        "first_msg_timestamp",
        "last_msg_timestamp",
        "first_msg_n_tok",
        "last_msg_n_tok",
    ]
    return (
        fragments.select(*cols)
        .groupBy("doc_id")
        .applyInPandas(lambda key, pdf: fn(pdf), schema=SEGMAP_SCHEMA)
    )
