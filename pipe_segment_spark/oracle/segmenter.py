"""Pure-Python oracle for the recast pipe-segment semantics.

Single-process, dict-based replay of the reference inner loops, used only as
the correctness target in pytest (SURVEY.md §7 Phase 1). The Spark engine
(operators/) must match this row-for-row including token-array equality.

Semantics replayed (reference file:line):
- deterministic multi-key intra-group sort        transform/fragment.py:115-140
- per-(key, day) multi-open-fragment state machine
  with gap + token-rate thresholds                transform/fragment_implementation.py:86-122
  (thresholds recast per BASELINE.json north_star)
- noise rule: records with no token payload form
  noise fragments -> frag_id None                 fragment_implementation.py:119,
                                                  tests/transform/test_fragment.py:146-148
- identity-only records attach to the best open
  fragment's signature but don't count            tests/transform/test_fragment.py:181-245
- frag/seg id scheme                              fragment.py:74-76 observable in
                                                  tests/transform/test_fragment.py:175-178
- greedy cross-day matcher with stale-key skip    transform/create_segment_map.py:11-21,84-147
- per-day segment stats w/ cumulative counters    transform/create_segments.py:20-73
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pipe_segment_spark.config import DEFAULT_PARAMS, SegmenterParams


def _fmt_ts(ts: datetime) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def frag_id_of(doc_id: str, first_ts: datetime, k: int) -> str:
    """Reference id scheme: '{key}-{first_ts:%Y-%m-%dT%H:%M:%S.%fZ}-{k}'."""
    return f"{doc_id}-{_fmt_ts(first_ts)}-{k}"


def sort_records(records: list[dict]) -> list[dict]:
    """Deterministic multi-key sort (reference fragment.py:115-140).

    None sorts greatest for numerics (none_to_inf) and as '' for strings
    (none_to_blank).
    """

    def none_inf(x):
        return float("inf") if x is None else x

    def none_blank(x):
        return "" if x is None else x

    return sorted(
        records,
        key=lambda r: (
            r["timestamp"],
            none_blank(r.get("msgid")),
            none_inf(r.get("n_tok")),
            none_blank(r.get("source")),
            none_blank(r.get("rec_type")),
            none_blank(r.get("ident_value")),
        ),
    )


def _hours(a: datetime, b: datetime) -> float:
    return (b - a).total_seconds() / 3600.0


@dataclass
class _OpenFrag:
    k: int
    doc_id: str
    first_ts: datetime
    last_ts: datetime = None  # type: ignore[assignment]
    first_n_tok: int = 0
    last_n_tok: int = 0
    first_tokens: list = field(default_factory=list)
    last_tokens: list = field(default_factory=list)
    msg_count: int = 0
    identities: Counter = field(default_factory=Counter)
    destinations: Counter = field(default_factory=Counter)
    msgids: list = field(default_factory=list)

    @property
    def frag_id(self) -> str:
        return frag_id_of(self.doc_id, self.first_ts, self.k)


def fragment_day(
    records: list[dict],
    params: SegmenterParams = DEFAULT_PARAMS,
) -> tuple[list[dict], list[dict]]:
    """Fragment one (doc_id, day) group of records.

    Returns (fragments, tagged_records). Multi-open state machine: each POS
    record joins the best-scoring open fragment (pair_score over Δt, Δn_tok)
    or opens a new one; IDENT records attach to the best fragment's identity
    signature (frag_id tagged, not counted in msg_count); payload-less
    records are noise (frag_id None).
    """
    if not records:
        return [], []
    doc_ids = {r["doc_id"] for r in records}
    assert len(doc_ids) == 1, doc_ids
    doc_id = next(iter(doc_ids))
    records = sort_records(records)

    open_frags: list[_OpenFrag] = []
    all_frags: list[_OpenFrag] = []  # every fragment ever opened, in k order
    next_k = 1
    tagged = []

    def best_frag(ts, n_tok):
        best = None
        best_score = 0.0
        for f in open_frags:
            h = _hours(f.last_ts, ts)
            score = params.pair_score(n_tok - f.last_n_tok, h)
            # ties -> earliest-opened fragment (stable since list is in open
            # order and strict > keeps the first)
            if score > best_score:
                best, best_score = f, score
        return best

    for r in records:
        ts = r["timestamp"]
        noise = r.get("tokens") is None or len(r["tokens"]) == 0 or r.get("n_tok") is None
        # age out fragments beyond the gap window (state bound)
        open_frags = [
            f for f in open_frags if _hours(f.last_ts, ts) <= params.max_gap_hours
        ]
        if noise:
            tagged.append({**r, "frag_id": None})
            continue
        if r.get("rec_type") == "IDENT":
            tgt = best_frag(ts, r["n_tok"])
            if tgt is not None:
                if r.get("ident_value") is not None:
                    tgt.identities[r["ident_value"]] += 1
                if r.get("dest_value") is not None:
                    tgt.destinations[r["dest_value"]] += 1
            tagged.append({**r, "frag_id": tgt.frag_id if tgt else None})
            continue
        tgt = best_frag(ts, r["n_tok"])
        if tgt is None:
            if len(open_frags) >= params.max_open_fragments:
                # evict stalest fragment (earliest last_ts) deterministically
                open_frags.sort(key=lambda f: (f.last_ts, f.k))
                open_frags.pop(0)
            tgt = _OpenFrag(
                k=next_k,
                doc_id=doc_id,
                first_ts=ts,
                first_n_tok=r["n_tok"],
                first_tokens=list(r["tokens"]),
            )
            next_k += 1
            open_frags.append(tgt)
            all_frags.append(tgt)
        tgt.last_ts = ts
        tgt.last_n_tok = r["n_tok"]
        tgt.last_tokens = list(r["tokens"])
        tgt.msg_count += 1
        tgt.msgids.append(r["msgid"])
        tagged.append({**r, "frag_id": tgt.frag_id})

    day = records[0]["timestamp"].date()
    day_ts = datetime(day.year, day.month, day.day, tzinfo=records[0]["timestamp"].tzinfo)
    frags = []
    for f in all_frags:  # already in k (open) order — deterministic
        frags.append(
            {
                "frag_id": f.frag_id,
                "doc_id": f.doc_id,
                "timestamp": day_ts,
                "msg_count": f.msg_count,
                "first_msg_timestamp": f.first_ts,
                "last_msg_timestamp": f.last_ts,
                "first_msg_n_tok": f.first_n_tok,
                "last_msg_n_tok": f.last_n_tok,
                "first_tokens": f.first_tokens,
                "last_tokens": f.last_tokens,
                "identities": sorted(
                    ({"value": v, "count": c} for v, c in f.identities.items()),
                    key=lambda d: d["value"],
                ),
                "destinations": sorted(
                    ({"value": v, "count": c} for v, c in f.destinations.items()),
                    key=lambda d: d["value"],
                ),
            }
        )
    return frags, tagged


def fragment_stream(
    records: list[dict], params: SegmenterParams = DEFAULT_PARAMS
) -> tuple[list[dict], list[dict]]:
    """Run fragment_day over every (doc_id, date) group (reference
    GroupBySsvidAndDay, pipeline.py:211-217)."""
    groups: dict[tuple, list[dict]] = {}
    for r in records:
        groups.setdefault((r["doc_id"], r["timestamp"].date()), []).append(r)
    frags, tagged = [], []
    for key in sorted(groups):
        f, t = fragment_day(groups[key], params)
        frags.extend(f)
        tagged.extend(t)
    return frags, tagged


# --------------------------------------------------------------------------
# Cross-day greedy matcher (reference create_segment_map.py:84-147)
# --------------------------------------------------------------------------


def _get_next(ordered: list, stale: set):
    while ordered:
        item = ordered.pop()
        _, _, id1, id2 = item
        if id1 not in stale and id2 not in stale:
            return item
    return None


def merge_fragments(
    doc_id: str,
    frags: list[dict],
    params: SegmenterParams = DEFAULT_PARAMS,
) -> list[dict]:
    """Greedy day-by-day fragment->segment assignment for one key.

    Exactly mirrors the reference algorithm: per day, score every (open
    segment, new fragment) pair; sort ascending and pop best; skip stale
    keys; one fragment joins one segment per day; unmatched fragments open
    new segments with seg_id = frag_id.
    """
    frag_map = {f["frag_id"]: f for f in frags}
    by_day: dict = {}
    for f in frags:
        by_day.setdefault(f["timestamp"].date(), set()).add(f["frag_id"])
    open_segs: dict[str, str] = {}
    out = []
    for day in sorted(by_day):
        new_frags = by_day[day]
        scores = []
        for seg_id, frag_id0 in open_segs.items():
            f0 = frag_map[frag_id0]
            for frag_id1 in new_frags:
                f1 = frag_map[frag_id1]
                h = _hours(f0["last_msg_timestamp"], f1["first_msg_timestamp"])
                score = params.match_score(
                    f1["first_msg_n_tok"] - f0["last_msg_n_tok"], h
                )
                scores.append((score, _tiebreak(seg_id, frag_id1), seg_id, frag_id1))
        scores.sort()
        active: dict[str, str] = {}
        stale: set[str] = set()
        while (item := _get_next(scores, stale)) is not None:
            score, _, seg_id, frag_id = item
            if score == 0.0:
                break
            active[seg_id] = frag_id
            new_frags.remove(frag_id)
            stale.add(seg_id)
            stale.add(frag_id)
        for seg_id, frag_id in active.items():
            out.append(
                {"doc_id": doc_id, "date": day, "seg_id": seg_id, "frag_id": frag_id}
            )
        open_segs = {}
        for frag_id in sorted(new_frags):
            open_segs[frag_id] = frag_id
            out.append(
                {"doc_id": doc_id, "date": day, "seg_id": frag_id, "frag_id": frag_id}
            )
        open_segs.update(active)
    return out


def _tiebreak(seg_id: str, frag_id: str):
    """Deterministic tie order for equal scores: the reference relies on
    tuple comparison of (score, seg_id, frag_id) strings
    (create_segment_map.py:75-76); we do the same explicitly."""
    return (seg_id, frag_id)


def segment_map(
    frags: list[dict], params: SegmenterParams = DEFAULT_PARAMS
) -> list[dict]:
    groups: dict[str, list[dict]] = {}
    for f in frags:
        groups.setdefault(f["doc_id"], []).append(f)
    out = []
    for doc_id in sorted(groups):
        out.extend(merge_fragments(doc_id, groups[doc_id], params))
    return out


# --------------------------------------------------------------------------
# Segment stats (reference create_segments.py:20-73)
# --------------------------------------------------------------------------


def create_segments(frags_with_seg: list[dict]) -> list[dict]:
    """Per seg_id, per day: emit last fragment with daily/cumulative counts."""
    groups: dict[str, list[dict]] = {}
    for f in frags_with_seg:
        groups.setdefault(f["seg_id"], []).append(f)
    out = []
    for seg_id in sorted(groups):
        frags = sorted(groups[seg_id], key=lambda x: x["first_msg_timestamp"])
        first_timestamp = frags[0]["first_msg_timestamp"]
        cum_msgs = 0
        cum_idents: Counter = Counter()
        cum_dests: Counter = Counter()
        by_day: dict = {}
        for f in frags:
            by_day.setdefault(f["timestamp"].date(), []).append(f)
        for day in sorted(by_day):
            daily = by_day[day]
            daily_msgs = 0
            daily_idents: Counter = Counter()
            daily_dests: Counter = Counter()
            for x in daily:
                daily_msgs += x["msg_count"]
                cum_msgs += x["msg_count"]
                for ident in x.get("identities", []):
                    daily_idents[ident["value"]] += ident["count"]
                    cum_idents[ident["value"]] += ident["count"]
                for dest in x.get("destinations", []):
                    daily_dests[dest["value"]] += dest["count"]
                    cum_dests[dest["value"]] += dest["count"]
            last = daily[-1]

            def _sorted(c):
                return sorted(
                    ({"value": v, "count": n} for v, n in c.items()),
                    key=lambda d: d["value"],
                )

            out.append(
                {
                    "seg_id": seg_id,
                    "frag_id": last["frag_id"],
                    "doc_id": last["doc_id"],
                    "timestamp": last["timestamp"],
                    "first_timestamp": first_timestamp,
                    "daily_msg_count": daily_msgs,
                    "cumulative_msg_count": cum_msgs,
                    "daily_identities": _sorted(daily_idents),
                    "cumulative_identities": _sorted(cum_idents),
                    "daily_destinations": _sorted(daily_dests),
                    "cumulative_destinations": _sorted(cum_dests),
                }
            )
    return out


def run_pipeline(
    records: list[dict], params: SegmenterParams = DEFAULT_PARAMS
) -> dict:
    """Full oracle pipeline: fragment -> merge -> segments -> tag.

    Returns dict with keys: fragments, segmap, segments, tagged_records.
    """
    frags, tagged = fragment_stream(records, params)
    segmap = segment_map(frags, params)
    seg_of_frag = {m["frag_id"]: m["seg_id"] for m in segmap}
    frags_with_seg = [{**f, "seg_id": seg_of_frag[f["frag_id"]]} for f in frags]
    segments = create_segments(frags_with_seg)
    tagged_records = [
        {**r, "seg_id": seg_of_frag.get(r["frag_id"]) if r["frag_id"] else None}
        for r in tagged
    ]
    return {
        "fragments": frags_with_seg,
        "segmap": segmap,
        "segments": segments,
        "tagged_records": tagged_records,
    }


def make_utc(*args) -> datetime:
    return datetime(*args, tzinfo=timezone.utc)
