"""Foreign-session-timezone guard: the external driver may build its
SparkSession in any timezone; token_stream forces UTC internally so the
NTZ-parquet -> timestamp cast (and every downstream day/hour bucket) stays
wall-clock identical to the DuckDB oracle (r01 NOTES #3)."""

from __future__ import annotations

from pipe_segment_spark.queries import ORACLES, QUERIES

from tests.conftest import SF_DIR
from tests.driver_mimic import compare, duck_con


def test_foreign_session_timezone(spark):
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        con = duck_con(SF_DIR)
        # tz-sensitive paths: raw derivation, day-bucketed sessionization,
        # the full engine's tagged output (kernel + joins + day grouping)
        for name in ("token_stream", "seg_fragments", "segmenter_full_tagged"):
            r = compare(
                spark, con, name, QUERIES[name], ORACLES[name], SF_DIR,
                verbose=False,
            )
            assert r["status"] == "OK", (name, r["status"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
