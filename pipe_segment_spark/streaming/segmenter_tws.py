"""Fourth streaming mode: sorted_prefix semantics on the Spark 4
``transformWithStateInPandas`` arbitrary-state API (mode name
``tws_sorted_prefix``).

Why this exists — state-I/O scaling. ``applyInPandasWithState`` carries ONE
opaque state value per key, so the buffered modes re-serialize the ENTIRE
record buffer (JSON string column) into the state store every microbatch:
per-batch state writes are O(buffered records), even when nothing releases.
The TWS ``ListState`` is append-only in the RocksDB-backed store — buffering
an arriving batch is O(batch) row appends, a watermark release rewrites only
the surviving out-of-order suffix, and the small fragmenter/segment state
(open fragments + open segments + pending day summaries, O(fragments))
lives in its own ``ValueState``. At 10^12-record scale with long-open days
that is the difference between state I/O proportional to the open-day
buffer and proportional to the arriving data — the same contract the
reference meets by re-reading its fragments table per daily run
(pipeline.py:231-242, read_fragments.py:12-99) recast onto Spark's
native keyed-state primitives.

Semantics are IDENTICAL to ``sorted_prefix`` (segmenter_stream.py): records
buffer per key; every batch, the records strictly below the watermark
release through the per-day kernel (6-key sort -> fragmenter with carried
per-day state -> boundary-summary merge), and a fired event-time timer
DRAINS everything (bounded-feed contract shared by all modes). The release
path is literally the same function (``_release_day``), so the batch
byte-identity argument carries over unchanged. Equality evidence TODAY is
the fake-state processor tests in tests/test_streaming_tws.py (including
byte-equivalence with the sorted_prefix kernel on the same batch/watermark
schedule); a gate query ``segmenter_streaming_tws`` (same recursive-CTE
oracle as the other modes) is PLANNED but not yet registered — the real
``transformWithStateInPandas`` operator path needs google.protobuf in the
Python env (absent in this image), so the end-to-end mode has not executed
on actual Spark here and the CLI marks ``tws_sorted_prefix`` EXPERIMENTAL.
Register the gate query the moment protobuf appears (2-line change in
queries/__init__.py per NOTES_NEXT_ROUND.md).

Requires the RocksDB state store provider (transformWithState's backing
store); ``transform_with_state_segmenter`` sets it on the session — see
its docstring for the fail-fast contract on conflicting providers.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from pipe_segment_spark.config import DEFAULT_PARAMS, SegmenterParams
from pipe_segment_spark.streaming.segmenter_stream import (
    OUTPUT_SCHEMA,
    US_PER_DAY,
    _BUF_COLS,
    _close_pending_days,
    _consume_seeds,
    _decode_state,
    _encode_state,
    _release_day,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

# one buffered record per ListState row; field order is load-bearing
# (must match _tuples_from_batch / _cols_from_rows)
BUF_SCHEMA = (
    "t long, nt integer, msgid string, rec string, src string, iv string, "
    "hp boolean"
)
META_SCHEMA = "js string"


def _tuples_from_batch(batch: pd.DataFrame) -> tuple[list[tuple], int]:
    """Arriving microbatch -> ListState row tuples (BUF_SCHEMA order) +
    min event time. Same noise/payload derivation as _append_to_buffer."""
    import numpy as np

    ts_us = batch["timestamp"].to_numpy("datetime64[us]").astype("int64")
    tokens = batch["tokens"].to_numpy()
    nt_f = batch["n_tok"].to_numpy(dtype="float64", na_value=np.nan)
    cols = {}
    for name, col in (
        ("msgid", "msgid"),
        ("rec", "rec_type"),
        ("src", "source"),
        ("iv", "ident_value"),
    ):
        if col in batch.columns:
            vals = batch[col].to_numpy(dtype=object)
            vals[pd.isna(vals)] = None
        else:
            vals = [None] * len(batch)
        cols[name] = vals
    rows = [
        (
            int(t),
            None if v != v else int(v),
            m,
            r,
            s,
            i,
            bool(tok is not None and len(tok) > 0),
        )
        for t, v, m, r, s, i, tok in zip(
            ts_us.tolist(),
            nt_f.tolist(),
            cols["msgid"],
            cols["rec"],
            cols["src"],
            cols["iv"],
            tokens,
        )
    ]
    return rows, int(ts_us.min())


def _day_cols_from_rows(rows: list[tuple]) -> dict[int, dict]:
    """ListState row tuples -> per-day columnar dicts in _BUF_COLS shape
    (the _release_day input format)."""
    by_day: dict[int, dict] = {}
    for t, nt, msgid, rec, src, iv, hp in rows:
        day = (t // US_PER_DAY) * US_PER_DAY
        b = by_day.setdefault(int(day), {c: [] for c in _BUF_COLS})
        b["t"].append(t)
        b["nt"].append(nt)
        b["msgid"].append(msgid)
        b["rec"].append(rec)
        b["src"].append(src)
        b["iv"].append(iv)
        b["hp"].append(hp)
    return by_day


class SortedPrefixProcessor(StatefulProcessor):
    """Keyed stateful processor: ListState record buffer + ValueState
    fragmenter/segment metadata + one event-time timer per key."""

    def __init__(self, params: SegmenterParams = DEFAULT_PARAMS):
        self.params = params

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.buf = handle.getListState("buf", BUF_SCHEMA)
        self.meta = handle.getValueState("meta", META_SCHEMA)

    def close(self) -> None:
        pass

    # -- meta helpers -------------------------------------------------
    # reuses the JSON codec of the applyInPandasWithState modes for the
    # SMALL state (frag_days / open_segs / pending); the record buffer
    # deliberately does NOT ride in this JSON — that is the whole point.
    def _load(self):
        if self.meta.exists():
            tup = self.meta.get()
            frag_days, open_segs, pending, _ = _decode_state(tup)
            min_t = json.loads(tup[0]).get("mt")
        else:
            frag_days, open_segs, pending, min_t = {}, {}, [], None
        return frag_days, open_segs, pending, min_t

    def _save(self, frag_days, open_segs, pending, min_t) -> None:
        (js,) = _encode_state(frag_days, open_segs, pending)
        d = json.loads(js)
        d["mt"] = min_t
        self.meta.update((json.dumps(d),))

    def _reset_timer(self, expiry_ms: int | None) -> None:
        existing = list(self.handle.listTimers())
        if expiry_ms is not None and existing == [expiry_ms]:
            return
        for t in existing:
            self.handle.deleteTimer(t)
        if expiry_ms is not None:
            self.handle.registerTimer(expiry_ms)

    # -- release machinery --------------------------------------------
    def _release_and_close(
        self, doc_id, release_below_us, frag_days, open_segs, pending, min_t
    ):
        """Release buffered records < release_below_us through the shared
        per-day kernel, then greedy-close every pending day fully below the
        released horizon. Skips the buffer read entirely when the watermark
        has not reached the oldest buffered record (min_t)."""
        tagged = []
        if min_t is not None and min_t < release_below_us:
            rows = list(self.buf.get())
            rel = [r for r in rows if r[0] < release_below_us]
            keep = [r for r in rows if r[0] >= release_below_us]
            if rel:
                for day_us, cols in sorted(_day_cols_from_rows(rel).items()):
                    tagged.append(
                        _release_day(
                            doc_id, day_us, cols, frag_days, pending, self.params
                        )
                    )
                if keep:
                    self.buf.put(keep)  # rewrite = O(out-of-order suffix)
                else:
                    self.buf.clear()
            min_t = min((r[0] for r in keep), default=None)
        closed_day_us = (
            float("inf")
            if release_below_us == float("inf")
            else (int(release_below_us) // US_PER_DAY) * US_PER_DAY
        )
        rows_out, open_segs, pending = _close_pending_days(
            doc_id, open_segs, pending, closed_day_us, self.params
        )
        frag_days = {d: v for d, v in frag_days.items() if d >= closed_day_us}
        return tagged, rows_out, frag_days, open_segs, pending, min_t

    def _next_timer(self, pending, min_t, wm_ms):
        days = [f["day_us"] for f in pending]
        if min_t is not None:
            days.append((min_t // US_PER_DAY) * US_PER_DAY)
        if not days:
            return None
        return max((min(days) + US_PER_DAY) // 1000, wm_ms + 1)

    # -- operator callbacks -------------------------------------------
    def handleInputRows(self, key, rows, timerValues):
        doc_id = key[0]
        frag_days, open_segs, pending, min_t = self._load()
        batch = pd.concat(list(rows), ignore_index=True)
        batch = _consume_seeds(batch, open_segs)
        if len(batch):
            tuples, batch_min = _tuples_from_batch(batch)
            self.buf.appendList(tuples)  # O(batch) appends, no rewrite
            min_t = batch_min if min_t is None else min(min_t, batch_min)
        wm_ms = timerValues.getCurrentWatermarkInMs()
        tagged, rows_out = [], []
        if wm_ms > 0:
            tagged, rows_out, frag_days, open_segs, pending, min_t = (
                self._release_and_close(
                    doc_id, wm_ms * 1000, frag_days, open_segs, pending, min_t
                )
            )
        self._save(frag_days, open_segs, pending, min_t)
        self._reset_timer(self._next_timer(pending, min_t, wm_ms))
        yield from tagged
        if rows_out:
            yield pd.DataFrame(rows_out)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        # bounded-feed drain contract shared by all modes: a fired
        # event-time timer closes EVERYTHING still held
        doc_id = key[0]
        frag_days, open_segs, pending, min_t = self._load()
        tagged, rows_out, frag_days, open_segs, pending, min_t = (
            self._release_and_close(
                doc_id, float("inf"), frag_days, open_segs, pending, min_t
            )
        )
        self._save(frag_days, open_segs, pending, min_t)
        self._reset_timer(None)
        yield from tagged
        if rows_out:
            yield pd.DataFrame(rows_out)


def transform_with_state_segmenter(
    records_stream: DataFrame,
    params: SegmenterParams = DEFAULT_PARAMS,
    watermark: str = "0 seconds",
) -> DataFrame:
    """records stream -> union-typed output (tagged + segmap rows), same
    contract as stream_segment(mode='sorted_prefix') on the TWS operator.

    SESSION-WIDE SIDE EFFECT (by necessity): transformWithState only runs
    on the RocksDB state store provider, and the provider class is a
    session conf, not a per-query one — so building this query sets it for
    every streaming query subsequently defined on the same session. The
    other engine modes are provider-agnostic (tests/test_rocksdb_state.py
    pins result equality across providers), so they are unaffected in
    behavior, only in backing store. To avoid silently flipping a session
    that explicitly chose a DIFFERENT non-default provider, this fails
    fast rather than overwrite it."""
    spark = records_stream.sparkSession
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    current = spark.conf.get(conf_key, None)
    default_provider = (
        "org.apache.spark.sql.execution.streaming.state"
        ".HDFSBackedStateStoreProvider"
    )
    if current not in (None, "", default_provider, ROCKSDB_PROVIDER):
        raise ValueError(
            f"transform_with_state_segmenter requires the RocksDB state "
            f"store provider, but the session already sets {conf_key}="
            f"{current!r}. Unset it (or set it to the RocksDB provider) "
            f"before building a tws_sorted_prefix query."
        )
    spark.conf.set(conf_key, ROCKSDB_PROVIDER)
    return (
        records_stream.withWatermark("timestamp", watermark)
        .groupBy("doc_id")
        .transformWithStateInPandas(
            SortedPrefixProcessor(params),
            OUTPUT_SCHEMA,
            "append",
            "eventTime",
        )
    )
