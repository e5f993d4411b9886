"""Event-time window operators (SURVEY.md §2.9) with DuckDB oracles.

- tumbling: reference GroupBySsvidAndDay / by_day (pipeline.py:211-217)
- sliding: reference bad-hour ±padding expansion (filter_bad_satellite_times)
- native session_window: Spark's built-in gap-based session op — the
  simplest form of the segmenter's session semantics (gap-only cut)
- vectorized pandas-UDF normalizer: reference shipdataprocess.normalize
  usage (segment_identity/transforms.py:4-12) recast as an Arrow-batched
  UDF with a relational oracle
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pipe_segment_spark.sources.token_stream import TOKEN_STREAM_CTE, token_stream


def q_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time windows per source."""
    df = token_stream(spark, sf_dir)
    w = F.window("timestamp", "1 day")
    return df.groupBy("source", w).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("n_tok").alias("sum_tok")
    ).select(
        "source",
        F.col("window.start").alias("w_start"),
        F.col("window.end").alias("w_end"),
        "cnt",
        "sum_tok",
    )


O_TUMBLING_DAILY = f"""
WITH {TOKEN_STREAM_CTE}
SELECT source,
       CAST(date_trunc('day', timestamp) AS TIMESTAMP) AS w_start,
       CAST(date_trunc('day', timestamp) + INTERVAL 1 DAY AS TIMESTAMP) AS w_end,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(n_tok) AS BIGINT) AS sum_tok
FROM token_stream GROUP BY 1, 2, 3
"""


def q_sliding_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h windows, 1h slide, per source — each event lands in two
    overlapping windows."""
    df = token_stream(spark, sf_dir)
    w = F.window("timestamp", "2 hours", "1 hour")
    return df.groupBy("source", w).agg(F.count(F.lit(1)).alias("cnt")).select(
        "source", F.col("window.start").alias("w_start"), "cnt"
    )


O_SLIDING_HOURS = f"""
WITH {TOKEN_STREAM_CTE},
expanded AS (
    SELECT source,
           date_trunc('hour', timestamp) - to_hours(off) AS w_start
    FROM token_stream, unnest([0, 1]) AS t(off)
)
SELECT source, CAST(w_start AS TIMESTAMP) AS w_start,
       CAST(count(*) AS BIGINT) AS cnt
FROM expanded GROUP BY 1, 2
"""


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native gap-based session window (30 min) per doc_id — the
    built-in analog of the segmenter's gap rule."""
    df = token_stream(spark, sf_dir)
    sw = F.session_window("timestamp", "30 minutes")
    return df.groupBy("doc_id", sw).agg(
        F.count(F.lit(1)).alias("cnt"), F.min("n_tok").alias("min_tok")
    ).select(
        "doc_id",
        F.col("session_window.start").alias("s_start"),
        F.col("session_window.end").alias("s_end"),
        "cnt",
        "min_tok",
    )


O_SESSION_WINDOW_NATIVE = f"""
WITH {TOKEN_STREAM_CTE},
lagged AS (
    SELECT doc_id, timestamp, n_tok,
           lag(timestamp) OVER (PARTITION BY doc_id ORDER BY timestamp, msgid)
               AS prev_ts
    FROM token_stream
),
flagged AS (
    SELECT *, CASE WHEN prev_ts IS NULL
                     OR timestamp - prev_ts > INTERVAL 30 MINUTE
                   THEN 1 ELSE 0 END AS newf
    FROM lagged
),
idx AS (
    SELECT *, sum(newf) OVER (PARTITION BY doc_id ORDER BY timestamp
                              ROWS UNBOUNDED PRECEDING) AS sidx
    FROM flagged
)
SELECT doc_id,
       min(timestamp) AS s_start,
       max(timestamp) + INTERVAL 30 MINUTE AS s_end,
       CAST(count(*) AS BIGINT) AS cnt,
       min(n_tok) AS min_tok
FROM idx GROUP BY doc_id, sidx
"""


def _make_normalize_udf():
    @pandas_udf("string")
    def normalize_value(s: pd.Series) -> pd.Series:
        """Vectorized identity normalizer: uppercase, strip non-alphanumerics
        (reference shipname/callsign normalization recast)."""
        return s.str.upper().str.replace(r"[^A-Z0-9]", "", regex=True)

    return normalize_value


def q_normalize_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas UDF over identity values + counted rollup."""
    normalize_value = _make_normalize_udf()
    df = (
        token_stream(spark, sf_dir)
        .where(F.col("ident_value").isNotNull())
        .withColumn("n_value", normalize_value("ident_value"))
    )
    return df.groupBy("doc_id", "n_value").agg(F.count(F.lit(1)).alias("cnt"))


O_NORMALIZE_IDENTITY = f"""
WITH {TOKEN_STREAM_CTE}
SELECT doc_id,
       regexp_replace(upper(ident_value), '[^A-Z0-9]', '', 'g') AS n_value,
       CAST(count(*) AS BIGINT) AS cnt
FROM token_stream
WHERE ident_value IS NOT NULL
GROUP BY 1, 2
"""


QUERIES = {
    "tumbling_daily": q_tumbling_daily,
    "sliding_hours": q_sliding_hours,
    "session_window_native": q_session_window_native,
    "normalize_identity": q_normalize_identity,
}

ORACLES = {
    "tumbling_daily": O_TUMBLING_DAILY,
    "sliding_hours": O_SLIDING_HOURS,
    "session_window_native": O_SESSION_WINDOW_NATIVE,
    "normalize_identity": O_NORMALIZE_IDENTITY,
}
