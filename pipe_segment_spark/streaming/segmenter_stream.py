"""Structured Streaming segmenter: the unbounded-path of the engine.

The reference simulates streaming with daily incremental batch runs that
carry open-segment state through a fragments table (pipeline.py:231-242,
read_fragments.py). Here it's native: a keyed ``applyInPandasWithState``
stateful operator with event-time watermarks.

Per key (doc_id), GroupState carries:
  - open fragments (the multi-open fragmenter state, kernel.OpenFragState)
  - per-day fragment summaries not yet segment-assigned
  - open segments (seg_id -> last fragment boundary) for cross-day matching
  - next fragment counter per day

Emission contract (append mode):
  - tagged records emit immediately (kind='tagged', frag_id assigned)
  - when the watermark passes the end of a day (+ match window), that day's
    fragments run the greedy matcher and segmap rows emit (kind='segmap') —
    exactly the reference's day-by-day merge order, so results are
    byte-identical to the batch engine on the same input
  - late records older than the watermark are dropped by Spark upstream
    (reference analog: cross-day late data starts a new segment / next run)

State is serialized as JSON in a single string column — small (O(open
fragments + open segments) per key, bounded by max_open_fragments).
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
    IntegerType,
    LongType,
)

from pipe_segment_spark.config import DEFAULT_PARAMS, SegmenterParams
from pipe_segment_spark.operators.kernel import (
    MICROS_PER_HOUR,
    OpenFragState,
    fragment_group,
    greedy_merge,
    sort_group,
)

US_PER_DAY = 86_400_000_000

# canonical input-stream schema (BASELINE.json input_hint shape)
INPUT_SCHEMA_DDL = (
    "doc_id string, source string, timestamp timestamp, tokens array<int>, "
    "n_tok int, msgid string, rec_type string, ident_value string"
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("doc_id", StringType()),
        StructField("timestamp", TimestampType()),
        StructField("msgid", StringType()),
        StructField("n_tok", IntegerType()),
        StructField("frag_id", StringType()),
        StructField("seg_id", StringType()),
        StructField("date", StringType()),
        StructField("msg_count", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("js", StringType())])


def _encode_state(open_frags, next_k, cur_day, open_segs, pending_frags) -> tuple:
    return (
        json.dumps(
            {
                "of": [
                    [f.k, f.first_us, f.last_us, f.last_n_tok, f.frag_id]
                    for f in open_frags
                ],
                "nk": next_k,
                "cd": cur_day,
                "os": open_segs,
                "pf": pending_frags,
            }
        ),
    )


def _decode_state(tup):
    d = json.loads(tup[0])
    frags = []
    for k, first_us, last_us, last_n_tok, frag_id in d["of"]:
        f = OpenFragState(k, first_us, last_n_tok, frag_id)
        f.last_us = last_us
        frags.append(f)
    return (
        frags,
        d["nk"],
        d["cd"],
        {k: tuple(v) for k, v in d["os"].items()},
        d["pf"],
    )


def make_stateful_segmenter(params: SegmenterParams = DEFAULT_PARAMS):
    """Returns the (key, pdf_iter, state) -> iter[pdf] function for
    applyInPandasWithState."""

    def close_days(doc_id, open_segs, pending_frags, up_to_day_us):
        """Run greedy matching for every pending day < up_to_day_us."""
        out = []
        days = sorted({f["day_us"] for f in pending_frags})
        remaining = pending_frags
        for day_us in days:
            if day_us >= up_to_day_us:
                break
            day_frags = [f for f in remaining if f["day_us"] == day_us]
            remaining = [f for f in remaining if f["day_us"] != day_us]
            fr = pd.DataFrame(day_frags)
            fr["date"] = pd.to_datetime(fr["day_us"], unit="us").dt.date
            segmap, open_segs = greedy_merge(doc_id, fr, params, open_segs)
            by_frag = {f["frag_id"]: f for f in day_frags}
            for _, r in segmap.iterrows():
                f = by_frag[r["frag_id"]]
                out.append(
                    {
                        "kind": "segmap",
                        "doc_id": doc_id,
                        "timestamp": pd.Timestamp(f["day_us"], unit="us"),
                        "msgid": None,
                        "n_tok": None,
                        "frag_id": r["frag_id"],
                        "seg_id": r["seg_id"],
                        "date": str(r["date"]),
                        "msg_count": int(f["msg_count"]),
                        "first_us": int(f["first_us"]),
                        "last_us": int(f["last_us"]),
                    }
                )
        return out, open_segs, remaining

    def fn(key, pdf_iter, state: GroupState):
        doc_id = key[0]
        if state.exists:
            open_frags, next_k, cur_day, open_segs, pending = _decode_state(
                state.get
            )
        else:
            open_frags, next_k, cur_day, open_segs, pending = [], 1, -1, {}, []

        rows_out = []

        if state.hasTimedOut:
            # watermark passed: close every pending day
            out, open_segs, pending = close_days(
                doc_id, open_segs, pending, float("inf")
            )
            rows_out.extend(out)
            state.update(
                _encode_state(open_frags, next_k, cur_day, open_segs, pending)
            )
        else:
            batch = pd.concat(list(pdf_iter), ignore_index=True)
            # state bootstrap (reference ReadFragments, read_fragments.py:12-99):
            # SEED rows carry historical open-segment state — (seg_id in
            # ident_value, last boundary in timestamp/n_tok) — and are
            # consumed before any real records
            if len(batch) and (batch["rec_type"] == "SEED").any():
                seeds = batch[batch["rec_type"] == "SEED"]
                batch = batch[batch["rec_type"] != "SEED"]
                for _, s in seeds.iterrows():
                    seg_id = s["ident_value"]
                    last_us = int(
                        pd.Timestamp(s["timestamp"]).to_datetime64().astype(
                            "datetime64[us]"
                        ).astype("int64")
                    )
                    open_segs[seg_id] = (last_us, int(s["n_tok"]))
                batch = batch.reset_index(drop=True)
            if len(batch):
                batch = sort_group(batch)
                ts_us_all = (
                    batch["timestamp"].to_numpy("datetime64[us]").astype("int64")
                )
                day_us_all = (ts_us_all // US_PER_DAY) * US_PER_DAY
                # fragmenter state is per (doc_id, day) — reset at day
                # boundaries (batch engine groups by (doc_id, day); cross-day
                # continuity is the merger's job)
                frag_ids = []
                for day in pd.unique(day_us_all):
                    mask = day_us_all == day
                    if day != cur_day:
                        open_frags, next_k, cur_day = [], 1, int(day)
                    ids, open_frags, next_k = fragment_group(
                        batch.loc[mask], params, open_frags, next_k
                    )
                    frag_ids.extend(ids)
                ts_us = ts_us_all
                # tagged records out
                for i in range(len(batch)):
                    rows_out.append(
                        {
                            "kind": "tagged",
                            "doc_id": doc_id,
                            "timestamp": batch["timestamp"].iloc[i],
                            "msgid": batch["msgid"].iloc[i],
                            "n_tok": None
                            if pd.isna(batch["n_tok"].iloc[i])
                            else int(batch["n_tok"].iloc[i]),
                            "frag_id": frag_ids[i],
                            "seg_id": None,
                            "date": None,
                            "msg_count": None,
                            "first_us": None,
                            "last_us": None,
                        }
                    )
                # update per-day pending fragment summaries
                by_id = {f["frag_id"]: f for f in pending}
                for i in range(len(batch)):
                    fid = frag_ids[i]
                    if fid is None:
                        continue
                    # IDENT rows don't advance fragments
                    if batch["rec_type"].iloc[i] == "IDENT":
                        continue
                    t = int(ts_us[i])
                    nt = int(batch["n_tok"].iloc[i])
                    day_us = (t // US_PER_DAY) * US_PER_DAY
                    f = by_id.get(fid)
                    if f is None:
                        f = {
                            "frag_id": fid,
                            "day_us": day_us,
                            "first_us": t,
                            "last_us": t,
                            "first_n_tok": nt,
                            "last_n_tok": nt,
                            "msg_count": 0,
                        }
                        by_id[fid] = f
                        pending.append(f)
                    f["last_us"] = t
                    f["last_n_tok"] = nt
                    f["msg_count"] += 1

            # close days that the watermark has fully passed
            wm_ms = state.getCurrentWatermarkMs()
            if wm_ms > 0:
                closed_day_us = (wm_ms * 1000 // US_PER_DAY) * US_PER_DAY
                out, open_segs, pending = close_days(
                    doc_id, open_segs, pending, closed_day_us
                )
                rows_out.extend(out)

            state.update(
                _encode_state(open_frags, next_k, cur_day, open_segs, pending)
            )
            if pending:
                next_close = min(f["day_us"] for f in pending) + US_PER_DAY
                state.setTimeoutTimestamp(max(next_close // 1000, wm_ms + 1))

        if rows_out:
            yield pd.DataFrame(rows_out)

    return fn


def stream_segment(
    records_stream: DataFrame,
    params: SegmenterParams = DEFAULT_PARAMS,
    watermark: str = "0 seconds",
) -> DataFrame:
    """records stream -> union-typed output (tagged records + segmap rows)."""
    return (
        records_stream.withWatermark("timestamp", watermark)
        .groupBy("doc_id")
        .applyInPandasWithState(
            make_stateful_segmenter(params),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def seed_rows_from_fragments(fragments: DataFrame) -> DataFrame:
    """Encode a historical fragments table (with seg_id) as SEED records for
    cold-start state bootstrap (reference ReadFragments: open segments from
    history flow into the first day's matching). Union these ahead of the
    record stream: ``seeds.unionByName(stream)`` (batch table + stream union
    requires writing seeds into the stream source's first file)."""
    return fragments.select(
        F.col("doc_id"),
        F.lit("seed").alias("source"),
        F.col("last_msg_timestamp").alias("timestamp"),
        F.lit(None).cast("array<int>").alias("tokens"),
        F.col("last_msg_n_tok").cast("int").alias("n_tok"),
        F.concat(F.lit("seed-"), F.col("frag_id")).alias("msgid"),
        F.lit("SEED").alias("rec_type"),
        F.col("seg_id").alias("ident_value"),
    )
