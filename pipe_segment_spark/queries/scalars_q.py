"""Scalar-function coverage (SURVEY.md §2.8) with DuckDB oracles.

- JSON extraction (tests/json coder analog; events.props is a JSON string)
- IMO-style zfill + range validation (invalid_values.py:131-133)
- IFNULL / SAFE_DIVIDE / LEAST null-handling (segment_vessel_daily.sql.j2:132-136)
- WhitelistFields projection + strip_identity arrays (P2/P3)
- haversine-style trig math (satellite_offsets.sql.j2:130-173)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipe_segment_spark.sources.token_stream import TOKEN_STREAM_CTE, token_stream


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the props column + grouped rollup."""
    ev = _events(spark, sf_dir).withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    return ev.groupBy("event_type").agg(
        F.sum("k").alias("sum_k"),
        F.count(F.when(F.col("k") > 50, 1)).alias("high_k"),
    )


O_JSON_EXTRACT = """
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(count(CASE WHEN CAST(json_extract(props, '$.k') AS INT) > 50
                       THEN 1 END) AS BIGINT) AS high_k
FROM events GROUP BY event_type
"""


def q_imo_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zfill + range validation (reference IMO rule): derive a pseudo-IMO,
    left-pad to 7, null when out of the valid range or failing the
    check-digit-style modulus."""
    df = token_stream(spark, sf_dir)
    imo_int = (F.col("n_tok") * 131071 + F.unix_micros("timestamp") % 1000) % 10_000_000
    df = df.withColumn("imo_int", imo_int)
    valid = (F.col("imo_int") >= 1_000_000) & (F.col("imo_int") % 97 != 0)
    return df.select(
        "msgid",
        F.when(valid, F.lpad(F.col("imo_int").cast("string"), 7, "0")).alias(
            "imo"
        ),
        valid.cast("int").alias("imo_valid"),
    )


O_IMO_VALIDATION = f"""
WITH {TOKEN_STREAM_CTE},
base AS (
    SELECT msgid,
           (n_tok * 131071 + epoch_us(timestamp) % 1000) % 10000000 AS imo_int
    FROM token_stream
)
SELECT msgid,
       CASE WHEN imo_int >= 1000000 AND imo_int % 97 <> 0
            THEN lpad(CAST(imo_int AS VARCHAR), 7, '0') END AS imo,
       CAST(imo_int >= 1000000 AND imo_int % 97 <> 0 AS INT) AS imo_valid
FROM base
"""


def q_safe_divide_least(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IFNULL / SAFE_DIVIDE / LEAST combo (reference
    segment_vessel_daily.sql.j2:132-136): per-key ratios with guarded
    division and clamping."""
    df = token_stream(spark, sf_dir)
    agg = df.groupBy("doc_id").agg(
        F.sum(F.when(F.col("rec_type") == "POS", 1).otherwise(0)).alias("pos_cnt"),
        F.sum(F.when(F.col("rec_type") == "IDENT", 1).otherwise(0)).alias(
            "ident_cnt"
        ),
    )
    safe_ratio = F.col("pos_cnt") / F.nullif(F.col("ident_cnt"), F.lit(0))
    return agg.select(
        "doc_id",
        "pos_cnt",
        "ident_cnt",
        F.coalesce(F.round(safe_ratio, 6), F.lit(-1.0)).alias("pos_per_ident"),
        F.least(F.col("pos_cnt"), F.col("ident_cnt") * 10).alias("clamped"),
    )


O_SAFE_DIVIDE_LEAST = f"""
WITH {TOKEN_STREAM_CTE},
agg AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN rec_type = 'POS' THEN 1 ELSE 0 END) AS BIGINT)
               AS pos_cnt,
           CAST(sum(CASE WHEN rec_type = 'IDENT' THEN 1 ELSE 0 END) AS BIGINT)
               AS ident_cnt
    FROM token_stream GROUP BY doc_id
)
SELECT doc_id, pos_cnt, ident_cnt,
       coalesce(round(pos_cnt / CAST(nullif(ident_cnt, 0) AS DOUBLE), 6), -1.0)
           AS pos_per_ident,
       CAST(least(pos_cnt, ident_cnt * 10) AS BIGINT) AS clamped
FROM agg
"""


def q_whitelist_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WhitelistFields projection (P2) + strip_identity arrays (P3):
    project the output schema, blank the payload arrays."""
    df = token_stream(spark, sf_dir)
    return df.select(
        "doc_id",
        "source",
        "timestamp",
        "msgid",
        F.array_join(
            F.array().cast("array<string>"), ","
        ).alias("tokens_s"),  # stripped payload (reference pipeline.py:65-69)
        F.lit(0).alias("n_tok_stripped"),
    )


O_WHITELIST_PROJECTION = f"""
WITH {TOKEN_STREAM_CTE}
SELECT doc_id, source, timestamp, msgid,
       '' AS tokens_s, 0 AS n_tok_stripped
FROM token_stream
"""


def q_haversine_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trig/geo math (satellite_offsets.sql.j2:130-173): treat consecutive
    per-doc n_tok values as pseudo lat/lon, compute equirectangular
    distance + bearing per consecutive pair."""
    df = token_stream(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("timestamp", "msgid")
    lat = (F.col("n_tok") - 49.0) * 0.9
    df = (
        df.withColumn("lat", lat)
        .withColumn("lon", (F.col("n_tok") * 3.0) % 360.0 - 180.0)
        .withColumn("prev_lat", F.lag("lat").over(w))
        .withColumn("prev_lon", F.lag("lon").over(w))
        .where(F.col("prev_lat").isNotNull())
    )
    rad = math.pi / 180.0
    dx = (F.col("lon") - F.col("prev_lon")) * F.cos(
        (F.col("lat") + F.col("prev_lat")) / 2 * rad
    )
    dy = F.col("lat") - F.col("prev_lat")
    dist = F.sqrt(dx * dx + dy * dy) * 111.195
    bearing = F.atan2(dy, dx)
    return df.select(
        "doc_id",
        "msgid",
        F.round(dist, 6).alias("dist_km"),
        F.round(bearing, 6).alias("bearing_rad"),
    )


O_HAVERSINE_DRIFT = f"""
WITH {TOKEN_STREAM_CTE},
pos AS (
    SELECT doc_id, msgid, timestamp,
           (n_tok - 49.0) * 0.9 AS lat,
           (n_tok * 3.0) % 360.0 - 180.0 AS lon
    FROM token_stream
),
lagged AS (
    SELECT *,
           lag(lat) OVER w AS prev_lat,
           lag(lon) OVER w AS prev_lon
    FROM pos
    WINDOW w AS (PARTITION BY doc_id ORDER BY timestamp, msgid)
)
SELECT doc_id, msgid,
       round(sqrt(pow((lon - prev_lon) * cos((lat + prev_lat) / 2 * {math.pi / 180.0!r}), 2)
                  + pow(lat - prev_lat, 2)) * 111.195, 6) AS dist_km,
       round(atan2(lat - prev_lat,
                   (lon - prev_lon) * cos((lat + prev_lat) / 2 * {math.pi / 180.0!r})), 6)
           AS bearing_rad
FROM lagged WHERE prev_lat IS NOT NULL
"""


def q_message_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A18 MessageStats (sandbox/stats/stats.py:15-96): per-key numeric
    stats (min/max/first/last/count, first/last by the deterministic
    (timestamp, msgid) order) + per-field most_common value with its count
    (MessageFieldCounter.most_common, ties broken by value)."""
    from pyspark.sql import Window

    df = token_stream(spark, sf_dir)
    ord_key = F.struct("timestamp", "msgid")
    numeric = df.groupBy("doc_id").agg(
        F.min("n_tok").alias("n_tok_min"),
        F.max("n_tok").alias("n_tok_max"),
        F.min_by("n_tok", ord_key).alias("n_tok_first"),
        F.max_by("n_tok", ord_key).alias("n_tok_last"),
        F.count("n_tok").alias("n_tok_count"),
    )

    def most_common(field: str):
        counts = df.groupBy("doc_id", field).agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc(field))
        return (
            counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                "doc_id",
                F.col(field).alias(f"{field}_mc"),
                F.col("cnt").alias(f"{field}_mc_count"),
            )
        )

    return numeric.join(most_common("source"), "doc_id").join(
        most_common("rec_type"), "doc_id"
    )


O_MESSAGE_STATS = f"""
WITH {TOKEN_STREAM_CTE},
ordered AS (
    SELECT doc_id, n_tok,
           first_value(n_tok) OVER w AS n_tok_first,
           last_value(n_tok) OVER w  AS n_tok_last
    FROM token_stream
    WINDOW w AS (PARTITION BY doc_id ORDER BY timestamp, msgid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
numeric AS (
    SELECT doc_id, min(n_tok) AS n_tok_min, max(n_tok) AS n_tok_max,
           min(n_tok_first) AS n_tok_first, min(n_tok_last) AS n_tok_last,
           CAST(count(n_tok) AS BIGINT) AS n_tok_count
    FROM ordered GROUP BY doc_id
),
src_mc AS (
    SELECT doc_id, source AS source_mc, cnt AS source_mc_count FROM (
        SELECT doc_id, source, CAST(count(*) AS BIGINT) AS cnt,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY count(*) DESC, source ASC) AS rn
        FROM token_stream GROUP BY doc_id, source
    ) WHERE rn = 1
),
rec_mc AS (
    SELECT doc_id, rec_type AS rec_type_mc, cnt AS rec_type_mc_count FROM (
        SELECT doc_id, rec_type, CAST(count(*) AS BIGINT) AS cnt,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY count(*) DESC, rec_type ASC) AS rn
        FROM token_stream GROUP BY doc_id, rec_type
    ) WHERE rn = 1
)
SELECT n.*, s.source_mc, s.source_mc_count, r.rec_type_mc, r.rec_type_mc_count
FROM numeric n
JOIN src_mc s ON s.doc_id = n.doc_id
JOIN rec_mc r ON r.doc_id = n.doc_id
"""


QUERIES = {
    "json_extract": q_json_extract,
    "imo_validation": q_imo_validation,
    "safe_divide_least": q_safe_divide_least,
    "whitelist_projection": q_whitelist_projection,
    "haversine_drift": q_haversine_drift,
    "message_stats": q_message_stats,
}

ORACLES = {
    "json_extract": O_JSON_EXTRACT,
    "imo_validation": O_IMO_VALIDATION,
    "safe_divide_least": O_SAFE_DIVIDE_LEAST,
    "whitelist_projection": O_WHITELIST_PROJECTION,
    "haversine_drift": O_HAVERSINE_DRIFT,
    "message_stats": O_MESSAGE_STATS,
}
