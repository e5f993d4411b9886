"""CLI argument parsing + validation for the segmenter jobs.

Reference user surface: ``pipe segment`` (cli/cli.py:28-41,
cli/commands/segment.py:74-116) takes ``--segmenter_params`` as a param
string / JSON blob and validates dates and ranges up front
(cli/commands/validator.py:8-28). Recast here:

- param strings accept BOTH the reference's prod-like compact form
  ``max_gap_hours:6, max_dtok_rate:30`` and a JSON object
  ``{"max_gap_hours": 6}`` (reference default ``"{}"``)
- unknown keys and non-numeric values fail fast with
  ``argparse.ArgumentTypeError`` (the reference's validator contract)
- ``--date-range YYYY-MM-DD,YYYY-MM-DD`` validates order at parse time
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
import json

from pipe_segment_spark.config import SegmenterParams

_NUMERIC_FIELDS = {
    f.name: f.type for f in dataclasses.fields(SegmenterParams)
}


def parse_segmenter_params(s: str) -> SegmenterParams:
    """'max_gap_hours:6, max_dtok_rate:30' or '{"max_gap_hours": 6}' ->
    SegmenterParams; unknown keys / bad values raise ArgumentTypeError."""
    s = (s or "").strip()
    if not s or s == "{}":
        return SegmenterParams()
    if s.startswith("{"):
        try:
            kv = json.loads(s)
        except json.JSONDecodeError as e:
            raise argparse.ArgumentTypeError(
                f"not valid JSON segmenter params: {s!r} ({e})"
            )
    else:
        kv = {}
        for part in s.split(","):
            if not part.strip():
                continue
            try:
                k, v = part.split(":", 1)
            except ValueError:
                raise argparse.ArgumentTypeError(
                    f"expected key:value in segmenter params, got {part!r}"
                )
            kv[k.strip()] = v.strip()
    clean = {}
    for k, v in kv.items():
        if k not in _NUMERIC_FIELDS:
            raise argparse.ArgumentTypeError(
                f"unknown segmenter param {k!r}; valid: "
                f"{sorted(_NUMERIC_FIELDS)}"
            )
        try:
            clean[k] = int(v) if k == "max_open_fragments" else float(v)
        except (TypeError, ValueError):
            raise argparse.ArgumentTypeError(
                f"segmenter param {k!r} must be numeric, got {v!r}"
            )
    params = SegmenterParams(**clean)
    if params.max_gap_hours <= 0 or params.max_dtok_rate <= 0:
        raise argparse.ArgumentTypeError(
            "max_gap_hours and max_dtok_rate must be positive"
        )
    if params.max_open_fragments < 1:
        raise argparse.ArgumentTypeError("max_open_fragments must be >= 1")
    return params


def valid_date(s: str) -> datetime.date:
    try:
        return datetime.datetime.strptime(s, "%Y-%m-%d").date()
    except ValueError:
        raise argparse.ArgumentTypeError(f"not a valid date: {s!r}")


def valid_daterange(s: str) -> tuple[datetime.date, datetime.date]:
    """'YYYY-MM-DD,YYYY-MM-DD' with start <= end."""
    try:
        a, b = s.split(",")
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"expected YYYY-MM-DD,YYYY-MM-DD, got {s!r}"
        )
    lo, hi = valid_date(a.strip()), valid_date(b.strip())
    if lo > hi:
        raise argparse.ArgumentTypeError(f"start after end in {s!r}")
    return lo, hi
