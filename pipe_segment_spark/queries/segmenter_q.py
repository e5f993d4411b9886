"""Segmenter-family queries (SQL-oracled, linear mode).

Spark side: pure Catalyst (window functions, joins, aggregations) from
operators/sessionize.py. Oracle side: the identical math in DuckDB SQL over
the shared token_stream CTE. Every float is produced by deterministic
integer-derived arithmetic so both engines hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipe_segment_spark.config import DEFAULT_PARAMS as P
from pipe_segment_spark.operators.sessionize import (
    session_fragments,
    session_segments_daily,
    session_tagged_records,
    sessionize,
)
from pipe_segment_spark.sources.token_stream import TOKEN_STREAM_CTE, token_stream

# ---------------------------------------------------------------------------
# shared DuckDB CTE text: token_stream + linear sessionization
# ---------------------------------------------------------------------------

GAP = P.max_gap_hours
RATE = P.max_dtok_rate
BUF = P.buffer_hours


def _sess_cte(cut_at_day: bool, id_col: str) -> str:
    day_cut = (
        "OR CAST(timestamp AS DATE) <> CAST(prev_ts AS DATE)" if cut_at_day else ""
    )
    return f"""
pos AS (
    SELECT doc_id, source, timestamp, tokens, n_tok, msgid,
           epoch_us(timestamp) AS us
    FROM token_stream
    WHERE rec_type = 'POS' AND n_tok IS NOT NULL
),
lagged AS (
    SELECT *,
           lag(us) OVER w AS prev_us,
           lag(n_tok) OVER w AS prev_n_tok,
           lag(timestamp) OVER w AS prev_ts
    FROM pos
    WINDOW w AS (PARTITION BY doc_id ORDER BY timestamp, msgid)
),
flagged AS (
    SELECT *,
           CASE WHEN prev_us IS NULL
                  OR (us - prev_us) / 3600000000.0 > {GAP}
                  OR abs(n_tok - prev_n_tok)
                     / greatest((us - prev_us) / 3600000000.0, {BUF}) >= {RATE}
                  {day_cut}
                THEN 1 ELSE 0 END AS newf
    FROM lagged
),
idx AS (
    SELECT *,
           sum(newf) OVER (PARTITION BY doc_id ORDER BY timestamp, msgid
                           ROWS UNBOUNDED PRECEDING) AS sidx
    FROM flagged
),
sess AS (
    SELECT *,
           doc_id || '-' ||
           CAST(min(us) OVER (PARTITION BY doc_id, sidx) AS VARCHAR) AS {id_col}
    FROM idx
)
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_token_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source scan + derivation (S1 ReadMessages analog)."""
    return token_stream(spark, sf_dir).select(
        "doc_id",
        "source",
        "timestamp",
        F.array_join("tokens", ",").alias("tokens_s"),
        "n_tok",
        "msgid",
        "rec_type",
    )


O_TOKEN_STREAM = f"""
WITH {TOKEN_STREAM_CTE}
SELECT doc_id, source, timestamp, array_to_string(tokens, ',') AS tokens_s,
       n_tok, msgid, rec_type
FROM token_stream
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear segmenter: POS records + seg_id (session-window CEP core)."""
    return sessionize(token_stream(spark, sf_dir), P).select(
        "doc_id", "timestamp", "msgid", "n_tok",
        F.array_join("tokens", ",").alias("tokens_s"), "seg_id",
    )


O_SESSIONIZE = f"""
WITH {TOKEN_STREAM_CTE}, {_sess_cte(False, "seg_id")}
SELECT doc_id, timestamp, msgid, n_tok,
       array_to_string(tokens, ',') AS tokens_s, seg_id
FROM sess
"""


def q_fragments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, day) fragment summaries (reference Fragment output)."""
    return session_fragments(token_stream(spark, sf_dir), P)


O_FRAGMENTS = f"""
WITH {TOKEN_STREAM_CTE}, {_sess_cte(True, "frag_id")},
ordered AS (
    SELECT *,
           first_value(n_tok) OVER wf  AS first_msg_n_tok,
           last_value(n_tok) OVER wl   AS last_msg_n_tok,
           first_value(tokens) OVER wf AS first_tokens,
           last_value(tokens) OVER wl  AS last_tokens
    FROM sess
    WINDOW wf AS (PARTITION BY doc_id, frag_id ORDER BY timestamp, msgid
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           wl AS (PARTITION BY doc_id, frag_id ORDER BY timestamp, msgid
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT doc_id, frag_id,
       CAST(date_trunc('day', min(timestamp)) AS TIMESTAMP) AS timestamp,
       CAST(count(*) AS BIGINT)                       AS msg_count,
       min(timestamp)                                 AS first_msg_timestamp,
       max(timestamp)                                 AS last_msg_timestamp,
       min(first_msg_n_tok)                           AS first_msg_n_tok,
       min(last_msg_n_tok)                            AS last_msg_n_tok,
       array_to_string(min(first_tokens), ',')        AS first_tokens_s,
       array_to_string(min(last_tokens), ',')         AS last_tokens_s
FROM ordered
GROUP BY doc_id, frag_id
"""


def q_segments_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(seg, day) daily/cumulative stats (reference CreateSegments)."""
    return session_segments_daily(token_stream(spark, sf_dir), P)


O_SEGMENTS_DAILY = f"""
WITH {TOKEN_STREAM_CTE}, {_sess_cte(False, "seg_id")},
daily AS (
    SELECT doc_id, seg_id, CAST(timestamp AS DATE) AS date,
           CAST(count(*) AS BIGINT) AS daily_msg_count,
           min(timestamp) AS first_msg_timestamp,
           max(timestamp) AS last_msg_timestamp
    FROM sess GROUP BY doc_id, seg_id, CAST(timestamp AS DATE)
)
SELECT doc_id, seg_id, date, daily_msg_count,
       CAST(sum(daily_msg_count) OVER w AS BIGINT) AS cumulative_msg_count,
       min(first_msg_timestamp) OVER w AS first_timestamp,
       last_msg_timestamp
FROM daily
WINDOW w AS (PARTITION BY seg_id ORDER BY date ROWS UNBOUNDED PRECEDING)
"""


def q_tagged_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All records left-tagged with nullable seg_id (TagWithSegId J1)."""
    return session_tagged_records(token_stream(spark, sf_dir), P)


O_TAGGED_RECORDS = f"""
WITH {TOKEN_STREAM_CTE}, {_sess_cte(False, "seg_id")}
SELECT t.doc_id, t.source, t.timestamp,
       array_to_string(t.tokens, ',') AS tokens_s,
       t.n_tok, t.msgid, t.rec_type, s.seg_id
FROM token_stream t LEFT JOIN sess s USING (doc_id, msgid)
"""


def q_invalid_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type invalid-value masking from the declarative rule table
    (functions/invalid_values.py; reference invalid_values.py:97-200):
    per-(type, field) bounds, fixed-point-compared bounds, sentinels, the
    IMO zfill+range rule, plus the group rule (both payload fields NULL
    together — reference VMS lat=lon=0)."""
    from pipe_segment_spark.functions.invalid_values import (
        compile_spark_mask,
        group_rule_spark,
    )

    df = token_stream(spark, sf_dir)
    src = F.col("source")
    rate = F.col("n_tok") / F.size("tokens")
    imo = F.substring("msgid", 2, 100)
    # fixed-position field pair (lat/lon analog): /1024 is an exact binary
    # scale, so both engines round the identical double
    # try_element_at: single-token rows have no tokens[2] (NULL, like the
    # DuckDB subscript), and ANSI mode would make element_at throw
    tok0 = F.try_element_at("tokens", F.lit(1)) / F.lit(1024.0)
    tok1 = F.try_element_at("tokens", F.lit(2)) / F.lit(1024.0)
    df = df.select(
        "doc_id",
        "source",
        "msgid",
        "tokens",
        compile_spark_mask("n_tok", F.col("n_tok"), src).alias("n_tok_valid"),
        compile_spark_mask("rate", rate, src).alias("rate_valid"),
        compile_spark_mask("ident", F.col("ident_value"), src).alias(
            "ident_valid"
        ),
        compile_spark_mask("imo", imo, src).alias("imo_valid"),
        compile_spark_mask("dest", F.col("dest_value"), src).alias(
            "dest_valid"
        ),
        compile_spark_mask("tok0", tok0, src).alias("tok0_valid"),
        compile_spark_mask("tok1", tok1, src).alias("tok1_valid"),
        tok0.alias("__tok0_raw"),
        tok1.alias("__tok1_raw"),
    )
    # group rule 1 (table-driven, reference VMS lat=lon=0): for
    # GROUP_RULE_TYPES, tok0 and tok1 both rounding to 0 null BOTH as a unit
    grp_pos = group_rule_spark(src, F.col("__tok0_raw"), F.col("__tok1_raw"))
    # group rule 2: single-token rows with n_tok == 1 null out both payload
    # fields together
    grp = (F.col("n_tok_valid") == 1) & (F.size("tokens") == 1)
    return df.select(
        "doc_id",
        "source",
        "msgid",
        F.when(grp, F.lit(None)).otherwise(F.col("n_tok_valid")).alias(
            "n_tok_valid"
        ),
        "rate_valid",
        "ident_valid",
        "imo_valid",
        "dest_valid",
        F.when(grp_pos, F.lit(None)).otherwise(F.col("tok0_valid")).alias(
            "tok0_valid"
        ),
        F.when(grp_pos, F.lit(None)).otherwise(F.col("tok1_valid")).alias(
            "tok1_valid"
        ),
        F.when(grp, F.lit(None))
        .otherwise(F.array_join("tokens", ","))
        .alias("tokens_s"),
    )


def _o_invalid_values() -> str:
    from pipe_segment_spark.functions.invalid_values import (
        compile_sql_mask,
        group_rule_sql,
    )

    n_tok = compile_sql_mask("n_tok", "n_tok")
    rate = compile_sql_mask("rate", "(CAST(n_tok AS DOUBLE) / len(tokens))")
    ident = compile_sql_mask("ident", "ident_value")
    imo = compile_sql_mask("imo", "substr(msgid, 2)")
    dest = compile_sql_mask("dest", "dest_value")
    t0_raw = "(CAST(tokens[1] AS DOUBLE) / 1024.0)"
    t1_raw = "(CAST(tokens[2] AS DOUBLE) / 1024.0)"
    tok0 = compile_sql_mask("tok0", t0_raw)
    tok1 = compile_sql_mask("tok1", t1_raw)
    grp_pos = group_rule_sql("source", t0_raw, t1_raw)
    return f"""
WITH {TOKEN_STREAM_CTE},
masked AS (
    SELECT doc_id, source, msgid, tokens,
           {n_tok} AS n_tok_valid,
           {rate} AS rate_valid,
           {ident} AS ident_valid,
           {imo} AS imo_valid,
           {dest} AS dest_valid,
           CASE WHEN {grp_pos} THEN NULL ELSE {tok0} END AS tok0_valid,
           CASE WHEN {grp_pos} THEN NULL ELSE {tok1} END AS tok1_valid
    FROM token_stream
)
SELECT doc_id, source, msgid,
       CASE WHEN n_tok_valid = 1 AND len(tokens) = 1 THEN NULL
            ELSE n_tok_valid END AS n_tok_valid,
       rate_valid, ident_valid, imo_valid, dest_valid,
       tok0_valid, tok1_valid,
       CASE WHEN n_tok_valid = 1 AND len(tokens) = 1 THEN NULL
            ELSE array_to_string(tokens, ',') END AS tokens_s
FROM masked
"""


O_INVALID_VALUES = _o_invalid_values()


def q_bad_hours_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FilterBadSatelliteTimes (J3): derive per-(source, hour) offsets,
    expand bad hours ±1h, broadcast anti-join records out."""
    df = token_stream(spark, sf_dir)
    offsets = df.groupBy(
        "source", F.date_trunc("hour", "timestamp").alias("hour")
    ).agg((F.sum("n_tok") / F.count(F.lit(1)) - F.lit(49.0)).alias("dt"))
    bad = (
        offsets.where(F.abs(F.col("dt")) > 8.0)
        .select(
            "source",
            F.explode(
                F.sequence(F.lit(-1), F.lit(1))
            ).alias("off"),
            "hour",
        )
        .select(
            "source",
            (F.col("hour") + F.make_interval(hours=F.col("off"))).alias("hour"),
        )
        .distinct()
    )
    return (
        df.withColumn("hour", F.date_trunc("hour", "timestamp"))
        .join(F.broadcast(bad), ["source", "hour"], "left_anti")
        .select("doc_id", "source", "timestamp", "msgid", "n_tok")
    )


O_BAD_HOURS_FILTER = f"""
WITH {TOKEN_STREAM_CTE},
offsets AS (
    SELECT source, date_trunc('hour', timestamp) AS hour,
           CAST(sum(n_tok) AS BIGINT) / CAST(count(*) AS DOUBLE) - 49.0 AS dt
    FROM token_stream GROUP BY 1, 2
),
bad AS (
    SELECT DISTINCT source, hour + to_hours(off) AS hour
    FROM offsets, unnest([-1, 0, 1]) AS t(off)
    WHERE abs(dt) > 8.0
)
SELECT t.doc_id, t.source, t.timestamp, t.msgid, t.n_tok
FROM (SELECT *, date_trunc('hour', timestamp) AS hour FROM token_stream) t
ANTI JOIN bad b ON t.source = b.source AND t.hour = b.hour
"""


def q_identity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counted identity signature per key (A9 summarize_identifiers,
    exploded form)."""
    return (
        token_stream(spark, sf_dir)
        .where((F.col("rec_type") == "IDENT") & F.col("ident_value").isNotNull())
        .groupBy("doc_id", F.col("ident_value").alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


O_IDENTITY_SUMMARY = f"""
WITH {TOKEN_STREAM_CTE}
SELECT doc_id, ident_value AS value, CAST(count(*) AS BIGINT) AS cnt
FROM token_stream
WHERE rec_type = 'IDENT' AND ident_value IS NOT NULL
GROUP BY doc_id, ident_value
"""


def q_most_common(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mostCommon SQL UDF (assets/util.sql.j2:15-35): top-1 value by count
    per group with deterministic tiebreak + relative frequency."""
    counts = (
        token_stream(spark, sf_dir)
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("source"))
    tot = Window.partitionBy("doc_id")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .withColumn("freq", F.round(F.col("cnt") / F.sum("cnt").over(tot), 6))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("source").alias("value"), "cnt", "freq")
    )


O_MOST_COMMON = f"""
WITH {TOKEN_STREAM_CTE},
counts AS (
    SELECT doc_id, source, CAST(count(*) AS BIGINT) AS cnt
    FROM token_stream GROUP BY 1, 2
),
ranked AS (
    SELECT *,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY cnt DESC, source ASC) AS rn,
           round(cnt / CAST(sum(cnt) OVER (PARTITION BY doc_id) AS DOUBLE), 6)
               AS freq
    FROM counts
)
SELECT doc_id, source AS value, cnt, freq FROM ranked WHERE rn = 1
"""


def q_min_freq_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minFreqFilter (assets/util.sql.j2:37-43): NULL unless freq > 0.25."""
    base = q_most_common(spark, sf_dir)
    return base.select(
        "doc_id",
        F.when(F.col("freq") > 0.25, F.col("value")).alias("value"),
        "freq",
    )


O_MIN_FREQ_FILTER = f"""
WITH base AS ({O_MOST_COMMON})
SELECT doc_id, CASE WHEN freq > 0.25 THEN value END AS value, freq FROM base
"""


def q_overlap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap detection (A13, segment_vessel_daily.sql.j2:99-121):
    LEAD(start) OVER per key, COUNTIF(end > next_start) HAVING > 0."""
    intervals = (
        token_stream(spark, sf_dir)
        .groupBy("doc_id", "source", F.to_date("timestamp").alias("date"))
        .agg(F.min("timestamp").alias("start_ts"), F.max("timestamp").alias("end_ts"))
    )
    w = Window.partitionBy("doc_id").orderBy("start_ts", "source", "date")
    return (
        intervals.withColumn("next_start", F.lead("start_ts").over(w))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("end_ts") > F.col("next_start"), 1).otherwise(0)
            ).alias("overlap_count")
        )
        .where(F.col("overlap_count") > 0)
    )


O_OVERLAP_DETECT = f"""
WITH {TOKEN_STREAM_CTE},
intervals AS (
    SELECT doc_id, source, CAST(timestamp AS DATE) AS date,
           min(timestamp) AS start_ts, max(timestamp) AS end_ts
    FROM token_stream GROUP BY 1, 2, 3
),
led AS (
    SELECT *, lead(start_ts) OVER (PARTITION BY doc_id
                                   ORDER BY start_ts, source, date) AS next_start
    FROM intervals
)
SELECT doc_id,
       CAST(sum(CASE WHEN end_ts > next_start THEN 1 ELSE 0 END) AS BIGINT)
           AS overlap_count
FROM led GROUP BY doc_id HAVING sum(CASE WHEN end_ts > next_start THEN 1 ELSE 0 END) > 0
"""


def q_dedup_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup to 1 record/minute (A17, satellite_offsets.sql.j2:77-102):
    ROW_NUMBER over (key, source, minute) ordered by distance from the
    minute center + deterministic tiebreakers."""
    df = token_stream(spark, sf_dir).withColumn(
        "minute", F.date_trunc("minute", "timestamp")
    )
    center_dist = F.abs(
        F.unix_micros("timestamp") - (F.unix_micros("minute") + F.lit(30_000_000))
    )
    w = Window.partitionBy("doc_id", "source", "minute").orderBy(
        center_dist.asc(), F.col("msgid").asc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "source", "minute", "msgid", "n_tok")
    )


O_DEDUP_MINUTE = f"""
WITH {TOKEN_STREAM_CTE},
base AS (
    SELECT *, date_trunc('minute', timestamp) AS minute FROM token_stream
),
ranked AS (
    SELECT *,
           row_number() OVER (
               PARTITION BY doc_id, source, minute
               ORDER BY abs(epoch_us(timestamp) - (epoch_us(minute) + 30000000)),
                        msgid
           ) AS rn
    FROM base
)
SELECT doc_id, source, minute, msgid, n_tok FROM ranked WHERE rn = 1
"""


def q_median_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact medians / percentiles per group (A15/W4 PERCENTILE_CONT)."""
    return (
        token_stream(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.round(F.expr("percentile(n_tok, 0.5)"), 6).alias("median_n_tok"),
            F.round(F.expr("percentile(n_tok, 0.25)"), 6).alias("p25_n_tok"),
            F.round(F.expr("percentile(n_tok, 0.75)"), 6).alias("p75_n_tok"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


O_MEDIAN_RATE = f"""
WITH {TOKEN_STREAM_CTE}
SELECT source,
       round(quantile_cont(n_tok, 0.5), 6)  AS median_n_tok,
       round(quantile_cont(n_tok, 0.25), 6) AS p25_n_tok,
       round(quantile_cont(n_tok, 0.75), 6) AS p75_n_tok,
       CAST(count(*) AS BIGINT) AS cnt
FROM token_stream GROUP BY source
"""


def q_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly ping counts (A16) + windowed conditional sum (W5)."""
    df = token_stream(spark, sf_dir).groupBy(
        "source", F.date_trunc("hour", "timestamp").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("pings"),
        F.sum(F.when(F.col("rec_type") == "IDENT", 1).otherwise(0)).alias(
            "ident_pings"
        ),
    )
    w_day = Window.partitionBy("source", F.to_date("hour"))
    return df.withColumn(
        "day_pings", F.sum("pings").over(w_day)
    )


O_HOURLY_COUNTS = f"""
WITH {TOKEN_STREAM_CTE},
hourly AS (
    SELECT source, date_trunc('hour', timestamp) AS hour,
           CAST(count(*) AS BIGINT) AS pings,
           CAST(sum(CASE WHEN rec_type = 'IDENT' THEN 1 ELSE 0 END) AS BIGINT)
               AS ident_pings
    FROM token_stream GROUP BY 1, 2
)
SELECT *,
       CAST(sum(pings) OVER (PARTITION BY source, CAST(hour AS DATE)) AS BIGINT)
           AS day_pings
FROM hourly
"""


def q_theta_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join (J4, satellite_offsets.sql.j2:126-131): equi on
    (hour, doc_id), inequality residual on source + value proximity."""
    base = (
        token_stream(spark, sf_dir)
        .groupBy("doc_id", "source", F.date_trunc("hour", "timestamp").alias("hour"))
        .agg(F.sum("n_tok").alias("sum_tok"), F.count(F.lit(1)).alias("cnt"))
        .withColumn("avg_tok", F.col("sum_tok") / F.col("cnt"))
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, ["doc_id", "hour"])
        .where(
            (F.col("a.source") < F.col("b.source"))
            & (F.abs(F.col("a.avg_tok") - F.col("b.avg_tok")) < 10.0)
        )
        .select(
            "doc_id",
            "hour",
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.round(F.col("a.avg_tok") - F.col("b.avg_tok"), 6).alias("dtok"),
        )
    )


O_THETA_JOIN_PAIRS = f"""
WITH {TOKEN_STREAM_CTE},
base AS (
    SELECT doc_id, source, date_trunc('hour', timestamp) AS hour,
           CAST(sum(n_tok) AS BIGINT) / CAST(count(*) AS DOUBLE) AS avg_tok
    FROM token_stream GROUP BY 1, 2, 3
)
SELECT a.doc_id, a.hour, a.source AS source_a, b.source AS source_b,
       round(a.avg_tok - b.avg_tok, 6) AS dtok
FROM base a JOIN base b ON a.doc_id = b.doc_id AND a.hour = b.hour
WHERE a.source < b.source AND abs(a.avg_tok - b.avg_tok) < 10.0
"""


def q_sources_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source union (J11 Flatten / unionByName)."""
    df = token_stream(spark, sf_dir)
    a = df.where(F.col("source").isin("click", "view"))
    b = df.where(F.col("source").isin("error", "purchase", "signup"))
    return (
        a.unionByName(b)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_tok").alias("sum_tok"))
    )


O_SOURCES_UNION = f"""
WITH {TOKEN_STREAM_CTE},
u AS (
    SELECT * FROM token_stream WHERE source IN ('click', 'view')
    UNION ALL
    SELECT * FROM token_stream WHERE source IN ('error', 'purchase', 'signup')
)
SELECT source, CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(n_tok) AS BIGINT) AS sum_tok
FROM u GROUP BY source
"""


def q_count_distinct_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 seg_vessel_ssvid: COUNT(DISTINCT day), MIN/MAX per key pair."""
    return (
        token_stream(spark, sf_dir)
        .groupBy("doc_id", "source")
        .agg(
            F.countDistinct(F.to_date("timestamp")).alias("active_days"),
            F.min("timestamp").alias("first_ts"),
            F.max("timestamp").alias("last_ts"),
        )
    )


O_COUNT_DISTINCT_DAYS = f"""
WITH {TOKEN_STREAM_CTE}
SELECT doc_id, source,
       CAST(count(DISTINCT CAST(timestamp AS DATE)) AS BIGINT) AS active_days,
       min(timestamp) AS first_ts, max(timestamp) AS last_ts
FROM token_stream GROUP BY doc_id, source
"""


def q_lineage_guid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vessel_id-style GUID (assets/util.sql.j2:45-67): formatted MD5 of
    identity fields."""
    base = (
        token_stream(spark, sf_dir)
        .groupBy("doc_id", "source")
        .agg(F.min(F.to_date("timestamp")).cast("string").alias("first_date"))
    )
    h = F.md5(F.concat_ws("|", "doc_id", "source", "first_date"))
    return base.select(
        "doc_id",
        "source",
        F.concat(
            F.substring(h, 1, 8),
            F.lit("-"),
            F.substring(h, 9, 4),
            F.lit("-"),
            F.substring(h, 13, 4),
        ).alias("lineage_id"),
    )


O_LINEAGE_GUID = f"""
WITH {TOKEN_STREAM_CTE},
base AS (
    SELECT doc_id, source,
           CAST(min(CAST(timestamp AS DATE)) AS VARCHAR) AS first_date
    FROM token_stream GROUP BY 1, 2
)
SELECT doc_id, source,
       substr(md5(doc_id || '|' || source || '|' || first_date), 1, 8) || '-' ||
       substr(md5(doc_id || '|' || source || '|' || first_date), 9, 4) || '-' ||
       substr(md5(doc_id || '|' || source || '|' || first_date), 13, 4)
           AS lineage_id
FROM base
"""


QUERIES = {
    "token_stream": q_token_stream,
    "seg_sessionize": q_sessionize,
    "seg_fragments": q_fragments,
    "seg_segments_daily": q_segments_daily,
    "seg_tagged_records": q_tagged_records,
    "invalid_values_mask": q_invalid_values,
    "bad_hours_filter": q_bad_hours_filter,
    "identity_summary": q_identity_summary,
    "most_common": q_most_common,
    "min_freq_filter": q_min_freq_filter,
    "overlap_detect": q_overlap_detect,
    "dedup_minute": q_dedup_minute,
    "median_rate": q_median_rate,
    "hourly_counts": q_hourly_counts,
    "theta_join_pairs": q_theta_join_pairs,
    "sources_union": q_sources_union,
    "count_distinct_days": q_count_distinct_days,
    "lineage_guid": q_lineage_guid,
}

ORACLES = {
    "token_stream": O_TOKEN_STREAM,
    "seg_sessionize": O_SESSIONIZE,
    "seg_fragments": O_FRAGMENTS,
    "seg_segments_daily": O_SEGMENTS_DAILY,
    "seg_tagged_records": O_TAGGED_RECORDS,
    "invalid_values_mask": O_INVALID_VALUES,
    "bad_hours_filter": O_BAD_HOURS_FILTER,
    "identity_summary": O_IDENTITY_SUMMARY,
    "most_common": O_MOST_COMMON,
    "min_freq_filter": O_MIN_FREQ_FILTER,
    "overlap_detect": O_OVERLAP_DETECT,
    "dedup_minute": O_DEDUP_MINUTE,
    "median_rate": O_MEDIAN_RATE,
    "hourly_counts": O_HOURLY_COUNTS,
    "theta_join_pairs": O_THETA_JOIN_PAIRS,
    "sources_union": O_SOURCES_UNION,
    "count_distinct_days": O_COUNT_DISTINCT_DAYS,
    "lineage_guid": O_LINEAGE_GUID,
}
