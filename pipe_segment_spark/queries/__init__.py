"""Driver-facing query registry.

Each sub-module exposes QUERIES (name -> callable(spark, sf_dir) -> DataFrame)
and ORACLES (name -> DuckDB SQL over the pre-registered views). Names without
an oracle entry get the driver's weaker rows-only check (non-SQL-expressible
ops: the full multi-open greedy segmenter, streaming, multimodal stubs).
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
