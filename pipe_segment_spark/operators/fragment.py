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


US_PER_DAY = 86_400_000_000

# narrow projection shipped into the fragmenter UDF: the heavy ``tokens``
# payload never crosses the Python boundary (it's reduced to a boolean
# ``has_payload`` JVM-side and re-attached by the msgid join afterwards)
_UDF_COLS = "doc_id timestamp msgid n_tok rec_type source has_payload".split()


def assign_frag_ids(pdf, params: SegmenterParams):
    """Kernel driver for one doc_id: deterministic sort, then per-day runs
    with fresh fragmenter state (the reference groups by (ssvid, day),
    pipeline.py:211-217 — day continuity is the greedy merger's job)."""
    import pandas as pd

    pdf = sort_group(pdf)
    ts_day = (
        pdf["timestamp"].to_numpy("datetime64[us]").astype("int64") // US_PER_DAY
    )
    frag_ids = []
    start = 0
    n = len(pdf)
    for i in range(1, n + 1):
        if i == n or ts_day[i] != ts_day[start]:
            ids, _, _ = fragment_group(pdf.iloc[start:i], params)
            frag_ids.extend(ids)
            start = i
    return pd.DataFrame(
        {"doc_id": pdf["doc_id"], "msgid": pdf["msgid"], "frag_id": frag_ids}
    )


def tag_fragments(
    records: DataFrame,
    params: SegmenterParams = DEFAULT_PARAMS,
    persist_map: bool = False,
) -> DataFrame:
    """records -> records + frag_id (null = noise).

    Physical shape: shuffle once on doc_id, run the stateful kernel over
    narrow columns (Arrow both ways ~40 bytes/row), shuffle-join the
    (msgid -> frag_id) map back onto the full rows. Day grouping happens
    inside the kernel — one Arrow batch per key instead of per (key, day)
    amortizes the per-group overhead ~30x.
    """
    cols = [c for c in INPUT_COLS if c in records.columns]
    missing = [c for c in INPUT_COLS if c not in records.columns]
    df = records.select(*cols)
    for c in missing:  # optional columns default to null
        df = df.withColumn(c, F.lit(None).cast("string"))

    narrow = df.select(
        *[c for c in _UDF_COLS if c != "has_payload"],
        (
            F.col("tokens").isNotNull()
            & (F.size("tokens") > 0)
            & F.col("n_tok").isNotNull()
        ).alias("has_payload"),
    )
    frag_map = (
        narrow.repartition("doc_id")  # explicit co-location (north_rule)
        .groupBy("doc_id")
        .applyInPandas(
            lambda key, pdf: assign_frag_ids(pdf, params),
            schema="doc_id string, msgid string, frag_id string",
        )
    )
    if persist_map:
        # the narrow (msgid, frag_id) map is the only UDF product — persisting
        # it lets every downstream consumer reuse one kernel pass while the
        # token-heavy record columns re-flow from the (column-pruned) scan
        frag_map = frag_map.persist()
    # shuffle-hash join, never broadcast: frag_map has one row per RECORD
    # (not per fragment) — a broadcast would ship the whole keyspace to
    # every task
    return df.join(frag_map.hint("shuffle_hash"), ["doc_id", "msgid"], "left").select(
        *INPUT_COLS, "frag_id"
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
