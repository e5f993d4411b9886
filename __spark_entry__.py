"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the full greedy segmenter over the
sf0.001-derived token stream). ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2, each with a DuckDB-checkable oracle —
including the stateful per-key-sequential ops (recursive-CTE replay in
queries/engine_oracle.py) and the multimodal stub (sha256 expression replay).
The engine is additionally exact-matched against an independent pure-Python
oracle in pytest.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pipe_segment_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full segmenter pipeline (fragment -> greedy merge ->
    segments) on /root/testdata/sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["segmenter_full_segments"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
