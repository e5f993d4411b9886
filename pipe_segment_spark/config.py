"""Segmenter parameters — the recast of the reference's segmenter knobs.

Reference: pipe_segment/cli/commands/segment.py:14-23 (prod-like example
``max_hours:24, max_speed:30, ...``) and tests/data/segmenter_params.json
(``{"max_hours": 8, "max_speed": 25, "lookback": 5, "hours_exp": 0.5}``).

Recast per BASELINE.json north_star: the AIS distance/speed thresholds become
inter-record thresholds over the tokenized schema:

- ``max_gap_hours``   <- max_hours: a record further than this from every open
  fragment's last record always starts a new fragment.
- ``max_dtok_rate``   <- max_speed: max tolerated ``|Δn_tok| / penalized_hours``
  (tokens-per-hour "speed") for a record to join a fragment.
- ``buffer_hours``    <- merge buffer_hours: lower bound on the time delta used
  in the rate denominator, so near-simultaneous records aren't infinitely picky.
- ``hours_exp``       <- hours_exp: sublinear time penalty exponent used by the
  pair-scoring metric in cross-window matching.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class SegmenterParams:
    max_gap_hours: float = 6.0
    max_dtok_rate: float = 30.0
    buffer_hours: float = 0.5
    hours_exp: float = 0.5
    # Cross-day segment<-fragment match window. The reference hardcodes
    # ``0 < hours < 24`` in the merger independent of the fragmenter's
    # max_hours (create_segment_map.py:43-44); we keep them independent too.
    match_window_hours: float = 24.0
    # Bound on simultaneously-open fragments per (doc_id, day) in the
    # multi-open fragmenter; keeps state O(1) per key at 10^12 scale.
    max_open_fragments: int = 16

    def penalized_hours(self, hours: float) -> float:
        """Effective hours used in the rate denominator (>= buffer_hours)."""
        return max(hours, self.buffer_hours)

    def rate(self, dtok: float, hours: float) -> float:
        return abs(dtok) / self.penalized_hours(hours)

    def _score(self, dtok: float, hours: float) -> float:
        r = self.rate(dtok, hours)
        if r > self.max_dtok_rate:
            return 0.0
        return (1.0 - r / self.max_dtok_rate) / (1.0 + hours**self.hours_exp)

    def pair_score(self, dtok: float, hours: float) -> float:
        """Intra-window (record <- open fragment) match quality in (0, 1];
        0.0 means "do not match".

        Mirrors the shape of the reference Matcher.compute_metric path
        (create_segment_map.py:38-50): gate on the time window, compute a
        penalized discrepancy rate, map to a monotone score where closer in
        token-space and time is better. Deterministic, no RNG.
        """
        if not (0.0 <= hours <= self.max_gap_hours):
            return 0.0
        return self._score(dtok, hours)

    def match_score(self, dtok: float, hours: float) -> float:
        """Cross-window (segment <- fragment) score: gated on
        ``0 < hours < match_window_hours``, mirroring the reference's
        hardcoded ``0 < hours < 24`` (create_segment_map.py:43-44) —
        independent of the fragmenter's gap threshold."""
        if not (0.0 < hours < self.match_window_hours):
            return 0.0
        return self._score(dtok, hours)


DEFAULT_PARAMS = SegmenterParams()
