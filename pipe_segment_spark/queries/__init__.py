"""Driver-facing query registry.

Each sub-module exposes QUERIES (name -> callable(spark, sf_dir) -> DataFrame)
and ORACLES (name -> DuckDB SQL over the pre-registered views). EVERY query
has an oracle — the stateful per-key-sequential ops (full greedy segmenter,
streaming drain) are replayed in DuckDB via recursive CTEs
(queries/engine_oracle.py), the multimodal stub via sha256 expression replay.
"""

from __future__ import annotations

from pipe_segment_spark.queries import (
    composite_q,
    corpus_q,
    engine_q,
    identity_q,
    relational_q,
    scalars_q,
    segmenter_q,
    windows_q,
)

QUERIES = {}
ORACLES = {}
for mod in (
    segmenter_q,
    relational_q,
    corpus_q,
    engine_q,
    windows_q,
    scalars_q,
    identity_q,
    composite_q,
):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

assert set(ORACLES) <= set(QUERIES), sorted(set(ORACLES) - set(QUERIES))
