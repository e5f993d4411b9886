"""Fragmenter: per-(doc_id, day) stateful record->fragment assignment.

Spark-first architecture (vs the reference's Beam GroupByKey + per-row dicts,
pipeline.py:211-217 + transform/fragment.py):

1. ``tag_fragments``: ONE ``applyInPandas`` pass over ``groupBy(doc_id,
   window(ts, '1 day'))`` emits the input rows + ``frag_id`` (nullable for
   noise). This is the only non-Catalyst step.
2. ``fragments_from_tagged``: fragments are derived RELATIONALLY from the
   tagged records via ``min_by``/``max_by``/explode aggregation — the
   reference's dual tagged-output (fragment.py:149-150) becomes a pure
   Catalyst aggregation with map-side partial aggs, no second UDF pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipe_segment_spark.config import DEFAULT_PARAMS, SegmenterParams
from pipe_segment_spark.operators.kernel import fragment_group, sort_group

TAGGED_SCHEMA = (
    "doc_id string, source string, timestamp timestamp, tokens array<int>, "
    "n_tok int, msgid string, rec_type string, ident_value string, "
    "frag_id string"
)

INPUT_COLS = [
    "doc_id",
    "source",
    "timestamp",
    "tokens",
    "n_tok",
    "msgid",
    "rec_type",
    "ident_value",
]


def tag_fragments(
    records: DataFrame, params: SegmenterParams = DEFAULT_PARAMS
) -> DataFrame:
    """records -> records + frag_id (null = noise).

    Groups on (doc_id, event-day). The day window mirrors the reference's
    GroupBySsvidAndDay (pipeline.py:211-217); cross-day continuity is
    restored downstream by the greedy merger (segment_map.py), exactly as in
    the reference.
    """

    def fn(pdf):
        pdf = sort_group(pdf)
        frag_ids, _, _ = fragment_group(pdf, params)
        out = pdf[INPUT_COLS].copy()
        out["frag_id"] = frag_ids
        return out

    cols = [c for c in INPUT_COLS if c in records.columns]
    missing = [c for c in INPUT_COLS if c not in records.columns]
    df = records.select(*cols)
    for c in missing:  # optional columns default to null
        df = df.withColumn(c, F.lit(None).cast("string"))
    return (
        df.repartition("doc_id")  # explicit co-location (north_rule)
        .groupBy("doc_id", F.to_date("timestamp").alias("__day"))
        .applyInPandas(lambda key, pdf: fn(pdf), schema=TAGGED_SCHEMA)
    )


def fragments_from_tagged(tagged: DataFrame) -> DataFrame:
    """Pure-Catalyst fragment summaries from tagged records.

    Replaces the reference's _fragment_record construction
    (fragment_implementation.py:21-56): first/last boundary payloads via
    min_by/max_by over POS rows, msg_count = POS row count, counted identity
    signature via explode + two-level aggregation (map-side partials free).
    """
    pos = tagged.where(F.col("frag_id").isNotNull())
    key_cols = [F.col("doc_id"), F.col("frag_id")]
    ord_key = F.struct(F.col("timestamp"), F.col("msgid"))
    is_pos = F.col("rec_type") != "IDENT"

    base = pos.groupBy(*key_cols).agg(
        F.date_trunc("day", F.min(F.when(is_pos, F.col("timestamp")))).alias(
            "timestamp"
        ),
        F.sum(is_pos.cast("long")).alias("msg_count"),
        F.min(F.when(is_pos, F.col("timestamp"))).alias("first_msg_timestamp"),
        F.max(F.when(is_pos, F.col("timestamp"))).alias("last_msg_timestamp"),
        F.min_by(
            F.when(is_pos, F.col("n_tok")), F.when(is_pos, ord_key)
        ).alias("first_msg_n_tok"),
        F.max_by(
            F.when(is_pos, F.col("n_tok")), F.when(is_pos, ord_key)
        ).alias("last_msg_n_tok"),
        F.min_by(F.when(is_pos, F.col("tokens")), F.when(is_pos, ord_key)).alias(
            "first_tokens"
        ),
        F.max_by(F.when(is_pos, F.col("tokens")), F.when(is_pos, ord_key)).alias(
            "last_tokens"
        ),
    )

    idents = (
        pos.where(~is_pos & F.col("ident_value").isNotNull())
        .groupBy("doc_id", "frag_id", "ident_value")
        .agg(F.count(F.lit(1)).alias("count"))
        .groupBy("doc_id", "frag_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("ident_value").alias("value"), F.col("count").alias("count")
                    )
                )
            ).alias("identities")
        )
    )

    return base.join(idents, ["doc_id", "frag_id"], "left").withColumn(
        "identities", F.coalesce(F.col("identities"), F.array())
    )
