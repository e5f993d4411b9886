"""satellite_offsets recast END-TO-END (VERDICT r01 ask #4).

The reference job (transform/assets/satellite_offsets.sql.j2:1-209) chains:
raw filter -> per-(receiver, hour) medians -> dedup to 1 msg/minute ->
self-join pairs within (ssvid, hour) with a course gate and
ROW_NUMBER pick-1 -> windowed per-day pair counts with a minimum ->
median offset per (receiver pair, hour) -> median-of-medians per
(receiver, hour) -> final LEFT JOIN enrichment. Round 1 shipped the five
constructs as isolated queries; this composes them as ONE query, both in
Spark and in the DuckDB oracle, to cover the compositional seams.

Recast over the tokenized schema: receiver -> source, speed -> n_tok,
expected travel time -> Δn_tok * 60 s. All float math is
integer-derived + round(6) so both engines hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipe_segment_spark.sources.token_stream import TOKEN_STREAM_CTE, token_stream

MIN_PAIRS_PER_DAY = 3
MAX_PAIR_DT_S = 600.0


def q_satellite_offsets_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = token_stream(spark, sf_dir).where(
        (F.col("rec_type") == "POS")
        & F.col("n_tok").isNotNull()
        & F.col("n_tok").between(2, 96)  # raw bounds filter analog
    )
    # ONE hash exchange on doc_id up front (r6, guide §2.4): the minute-
    # dedup window (doc, source, minute), the pair self-join (doc, hour)
    # and the pick-1 window (doc, src_a, src_b, hour) are all satisfied by
    # HashPartitioning(doc_id), so the whole pair branch runs on this
    # single record-cardinality shuffle (the old plan paid a second full
    # exchange to re-key the deduped rows for the join). The (source,
    # hour) aggregation branches keep their own partial-agg exchanges.
    raw = df.withColumn("hour", F.date_trunc("hour", "timestamp")).repartition(
        "doc_id"
    )

    # per-(source, hour) medians over the raw stream (median_dist_from_sat)
    med_stats = raw.groupBy("source", "hour").agg(
        F.round(F.expr("percentile(n_tok, 0.5)"), 6).alias("med_n_tok"),
        F.round(F.sum("n_tok") / F.count(F.lit(1)), 6).alias("avg_n_tok"),
    )

    # speed-limited + dedup to 1 msg per (doc, source, minute)
    lim = raw.where(F.col("n_tok").between(5, 95)).withColumn(
        "minute", F.date_trunc("minute", "timestamp")
    )
    center = F.abs(
        F.unix_micros("timestamp")
        - (F.unix_micros("minute") + F.lit(30_000_000))
    )
    w_min = Window.partitionBy("doc_id", "source", "minute").orderBy(
        center.asc(), F.col("msgid").asc()
    )
    base = (
        lim.withColumn("rn", F.row_number().over(w_min))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "source",
            "hour",
            "msgid",
            "n_tok",
            F.unix_micros("timestamp").alias("us"),
        )
    )

    hours = base.groupBy("source", "hour").agg(
        F.count(F.lit(1)).alias("pings")
    )

    # pair self-join within (doc, hour), pick-1 per (doc, src pair, hour)
    a, b = base.alias("a"), base.alias("b")
    pairs = (
        a.join(b, ["doc_id", "hour"])
        .where(F.col("a.source") < F.col("b.source"))
        .select(
            "doc_id",
            "hour",
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            (F.col("b.us") - F.col("a.us")).alias("dt_us"),
            F.col("a.n_tok").alias("nt_a"),
            F.col("b.n_tok").alias("nt_b"),
            F.col("a.msgid").alias("mid_a"),
            F.col("b.msgid").alias("mid_b"),
        )
    )
    w_pair = Window.partitionBy("doc_id", "src_a", "src_b", "hour").orderBy(
        F.abs(F.col("dt_us")).asc(), F.col("mid_a").asc(), F.col("mid_b").asc()
    )
    picked = (
        pairs.withColumn("rn", F.row_number().over(w_pair))
        .where(
            (F.col("rn") == 1)
            & (F.abs(F.col("dt_us")) < F.lit(MAX_PAIR_DT_S * 1e6))
        )
    )

    # per-day pair-count gate (windowed conditional sum)
    w_day = Window.partitionBy("src_a", "src_b", F.to_date("hour"))
    close = picked.withColumn(
        "pair_count", F.count(F.lit(1)).over(w_day)
    ).where(F.col("pair_count") >= MIN_PAIRS_PER_DAY)

    # offset = observed dt - expected dt (Δn_tok * 60 s)
    offset = (
        F.col("dt_us") / F.lit(1e6)
        - (F.col("nt_b") - F.col("nt_a")) * F.lit(60.0)
    )
    grouped = close.withColumn("offset", offset).groupBy(
        "src_a", "src_b", "hour"
    ).agg(F.round(F.expr("percentile(offset, 0.5)"), 6).alias("g_dt"))

    by_src = grouped.groupBy(
        F.col("src_a").alias("receiver"), "hour"
    ).agg(F.round(F.expr("percentile(g_dt, 0.5)"), 6).alias("dt"))

    return (
        by_src.join(
            hours.withColumnRenamed("source", "receiver"),
            ["receiver", "hour"],
            "left",
        )
        .join(
            med_stats.withColumnRenamed("source", "receiver"),
            ["receiver", "hour"],
            "left",
        )
        .select(
            "receiver",
            (F.unix_micros("hour") / F.lit(1e6)).alias("hour_epoch"),
            "dt",
            "pings",
            "med_n_tok",
            "avg_n_tok",
        )
    )


O_SATELLITE_OFFSETS_FULL = f"""
WITH {TOKEN_STREAM_CTE},
raw AS (
    SELECT *, date_trunc('hour', timestamp) AS hour,
           epoch_us(timestamp) AS us
    FROM token_stream
    WHERE rec_type = 'POS' AND n_tok IS NOT NULL AND n_tok BETWEEN 2 AND 96
),
med_stats AS (
    SELECT source, hour,
           round(quantile_cont(n_tok, 0.5), 6) AS med_n_tok,
           round(CAST(sum(n_tok) AS BIGINT) / CAST(count(*) AS DOUBLE), 6)
               AS avg_n_tok
    FROM raw GROUP BY source, hour
),
lim AS (
    SELECT *, date_trunc('minute', timestamp) AS minute
    FROM raw WHERE n_tok BETWEEN 5 AND 95
),
base AS (
    SELECT doc_id, source, hour, msgid, n_tok, us FROM (
        SELECT *,
               row_number() OVER (
                   PARTITION BY doc_id, source, minute
                   ORDER BY abs(us - (epoch_us(minute) + 30000000)), msgid
               ) AS rn
        FROM lim
    ) WHERE rn = 1
),
hours AS (
    SELECT source, hour, CAST(count(*) AS BIGINT) AS pings
    FROM base GROUP BY source, hour
),
pairs AS (
    SELECT a.doc_id, a.hour,
           a.source AS src_a, b.source AS src_b,
           b.us - a.us AS dt_us,
           a.n_tok AS nt_a, b.n_tok AS nt_b,
           row_number() OVER (
               PARTITION BY a.doc_id, a.source, b.source, a.hour
               ORDER BY abs(b.us - a.us), a.msgid, b.msgid) AS rn
    FROM base a
    JOIN base b ON a.doc_id = b.doc_id AND a.hour = b.hour
    WHERE a.source < b.source
),
close AS (
    SELECT *,
           count(*) OVER (PARTITION BY src_a, src_b, CAST(hour AS DATE))
               AS pair_count
    FROM pairs
    WHERE rn = 1 AND abs(dt_us) < {MAX_PAIR_DT_S} * 1000000
),
grouped AS (
    SELECT src_a, src_b, hour,
           round(quantile_cont(
               CAST(dt_us AS DOUBLE) / 1000000.0 - (nt_b - nt_a) * 60.0,
               0.5), 6) AS g_dt
    FROM close
    WHERE pair_count >= {MIN_PAIRS_PER_DAY}
    GROUP BY src_a, src_b, hour
),
by_src AS (
    SELECT src_a AS receiver, hour,
           round(quantile_cont(g_dt, 0.5), 6) AS dt
    FROM grouped GROUP BY src_a, hour
)
SELECT s.receiver,
       CAST(epoch_us(s.hour) AS DOUBLE) / 1000000.0 AS hour_epoch,
       s.dt, h.pings, m.med_n_tok, m.avg_n_tok
FROM by_src s
LEFT JOIN hours h ON h.source = s.receiver AND h.hour = s.hour
LEFT JOIN med_stats m ON m.source = s.receiver AND m.hour = s.hour
"""


QUERIES = {
    "satellite_offsets_full": q_satellite_offsets_full,
}

ORACLES = {
    "satellite_offsets_full": O_SATELLITE_OFFSETS_FULL,
}
