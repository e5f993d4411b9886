"""Linear-mode sessionization: the SQL-expressible segmenter path.

The full engine keeps MULTIPLE open fragments per key (interleaved
transmitters, reference gpsdio Segmenter). When ``max_open_fragments == 1``
("linear mode": every record either continues the most recent fragment or
starts a new one) the semantics collapse to classic gap/rate sessionization,
expressible entirely in Catalyst window functions — lag + running sum of
boundary flags. This mode is both a first-class operator (it IS
``session_window``-style CEP with a custom predicate: gap threshold AND
token-rate threshold, reference fragment_implementation.py:86-122 recast) and
the driver's SQL-oracle surface: DuckDB can replay it exactly.

All timestamp math is integer epoch-micros -> double hours, bit-identical
between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipe_segment_spark.config import DEFAULT_PARAMS, SegmenterParams


def _boundary_flag(params: SegmenterParams, cut_at_day: bool):
    """Catalyst expression: 1 when this row starts a new fragment/segment."""
    dh = (F.col("__us") - F.col("__prev_us")) / F.lit(3.6e9)
    rate = F.abs(F.col("n_tok") - F.col("__prev_n_tok")) / F.greatest(
        dh, F.lit(params.buffer_hours)
    )
    # rate >= (not >): the kernel/oracle score is exactly 0.0 at
    # rate == max_dtok_rate (config._score), i.e. no-match -> new fragment
    cond = (
        F.col("__prev_us").isNull()
        | (dh > F.lit(params.max_gap_hours))
        | (rate >= F.lit(params.max_dtok_rate))
    )
    if cut_at_day:
        cond = cond | (
            F.to_date("timestamp") != F.to_date(F.col("__prev_ts"))
        )
    return cond.cast("long")


def sessionize(
    records: DataFrame,
    params: SegmenterParams = DEFAULT_PARAMS,
    cut_at_day: bool = False,
    id_col: str = "seg_id",
) -> DataFrame:
    """POS records -> records + session id.

    id = '{doc_id}-{epoch_us of session first record}' (the reference's
    frag_id/seg_id lineage scheme §1.3, recast portably).
    """
    w = Window.partitionBy("doc_id").orderBy("timestamp", "msgid")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    df = (
        records.where(
            (F.col("rec_type") == "POS") & F.col("n_tok").isNotNull()
        )
        .withColumn("__us", F.unix_micros("timestamp"))
        .withColumn("__prev_us", F.lag("__us").over(w))
        .withColumn("__prev_ts", F.lag("timestamp").over(w))
        .withColumn("__prev_n_tok", F.lag("n_tok").over(w))
        .withColumn("__new", _boundary_flag(params, cut_at_day))
        .withColumn("__sidx", F.sum("__new").over(w_run))
    )
    w_sess = Window.partitionBy("doc_id", "__sidx")
    df = df.withColumn(
        id_col,
        F.concat(
            F.col("doc_id"), F.lit("-"), F.min("__us").over(w_sess).cast("string")
        ),
    )
    return df.drop("__us", "__prev_us", "__prev_ts", "__prev_n_tok", "__new", "__sidx")


def session_fragments(
    records: DataFrame, params: SegmenterParams = DEFAULT_PARAMS
) -> DataFrame:
    """Per-(doc_id, day) fragment summaries in linear mode (reference
    Fragment output, transform/fragment.py:24-72)."""
    tagged = sessionize(records, params, cut_at_day=True, id_col="frag_id")
    return tagged.groupBy("doc_id", "frag_id").agg(
        F.date_trunc("day", F.min("timestamp")).alias("timestamp"),
        F.count(F.lit(1)).alias("msg_count"),
        F.min("timestamp").alias("first_msg_timestamp"),
        F.max("timestamp").alias("last_msg_timestamp"),
        F.min_by("n_tok", F.struct("timestamp", "msgid")).alias("first_msg_n_tok"),
        F.max_by("n_tok", F.struct("timestamp", "msgid")).alias("last_msg_n_tok"),
        F.array_join(
            F.min_by("tokens", F.struct("timestamp", "msgid")), ","
        ).alias("first_tokens_s"),
        F.array_join(
            F.max_by("tokens", F.struct("timestamp", "msgid")), ","
        ).alias("last_tokens_s"),
    )


def session_segments_daily(
    records: DataFrame, params: SegmenterParams = DEFAULT_PARAMS
) -> DataFrame:
    """Per-(seg_id, day) daily + cumulative stats in linear mode (reference
    CreateSegments, transform/create_segments.py:20-73)."""
    tagged = sessionize(records, params, cut_at_day=False, id_col="seg_id")
    daily = tagged.groupBy(
        "doc_id", "seg_id", F.to_date("timestamp").alias("date")
    ).agg(
        F.count(F.lit(1)).alias("daily_msg_count"),
        F.min("timestamp").alias("first_msg_timestamp"),
        F.max("timestamp").alias("last_msg_timestamp"),
    )
    # doc_id prefixed to the partition keys (r6): seg_id embeds doc_id, so
    # the partitions are unchanged — but HashPartitioning(doc_id) from the
    # sessionize exchange now satisfies the window too, making the whole
    # query a single-shuffle plan (2 Exchanges -> 1)
    w_cum = (
        Window.partitionBy("doc_id", "seg_id")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "doc_id",
        "seg_id",
        "date",
        "daily_msg_count",
        F.sum("daily_msg_count").over(w_cum).alias("cumulative_msg_count"),
        F.min("first_msg_timestamp").over(w_cum).alias("first_timestamp"),
        "last_msg_timestamp",
    )


def session_tagged_records(
    records: DataFrame, params: SegmenterParams = DEFAULT_PARAMS
) -> DataFrame:
    """All records tagged with nullable frag_id/seg_id (noise + IDENT rows
    stay null in linear mode) — reference TagWithSegId semantics
    (transform/tag_with_seg_id.py:9-26) via left join back to the input."""
    tagged = sessionize(records, params, cut_at_day=False, id_col="seg_id").select(
        "doc_id", "msgid", "seg_id"
    )
    # join on (doc_id, msgid): reuses the doc_id partitioning and is robust
    # to cross-doc msgid collisions (uniqueness within doc_id is asserted in
    # tests/test_tables.py::test_msgid_unique_contract)
    return records.join(tagged, ["doc_id", "msgid"], "left").select(
        "doc_id",
        "source",
        "timestamp",
        F.array_join("tokens", ",").alias("tokens_s"),
        "n_tok",
        "msgid",
        "rec_type",
        "seg_id",
    )
