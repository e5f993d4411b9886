"""The engine's primary input: a tokenized record stream.

Shape per BASELINE.json input_hint:
    (doc_id:string, tokens:array<int32>, n_tok:int32, source:string)
plus the event-time / lineage columns every reference test keys on
(FIXTURES.md F1): ``timestamp``, ``msgid``, ``rec_type``.

Two producers:

1. ``token_stream(spark, sf_dir)`` — deterministic derivation from the
   driver-generated ``events`` parquet table.  The SAME derivation exists as a
   SQL CTE (``TOKEN_STREAM_CTE``) runnable by DuckDB so the driver's
   Spark-vs-DuckDB correctness gate can hash identical rows.  Every expression
   here is chosen to be bit-identical across both engines (integer modulo,
   microsecond epochs, no engine-specific hashing).

2. ``read_token_table`` — reads a materialized partitioned token table
   (the Iceberg-layout path used by bench/streaming).

Reference analog: transform/read_messages.py:19-68 (per-source scan + union
+ timestamp cast); here Catalyst does shard pruning natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Derivation constants — shared with the SQL text below. Changing one side
# without the other breaks the oracle gate.
N_DOCS = 40  # doc_id = 'd' || (user_id % N_DOCS) → ~zipf-ish hot keys
TOK_MOD = 97  # n_tok in 1..97
LEN_MOD = 7  # token-array length in 1..7
VOCAB = 50000
IDENT_EVERY = 11  # event_id % 11 == 0 → identity-only record


def token_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic tokenized stream derived from the events table.

    All columns are built from Catalyst expressions (whole-stage codegen,
    no Python). ``tokens[i] = (event_id*31 + i*7) % VOCAB`` for i in 1..m.
    """
    # event time is canonical UTC; the driver's session may differ, and the
    # NTZ->timestamp cast below is session-tz-sensitive
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.concat(F.lit("d"), (F.col("user_id") % N_DOCS).cast("string")).alias(
            "doc_id"
        ),
        F.col("event_type").alias("source"),
        # parquet timestamps arrive as TIMESTAMP_NTZ; the engine's event time
        # is tz-aware UTC (session tz is UTC, so the cast is wall-clock no-op)
        F.col("ts").cast("timestamp").alias("timestamp"),
        F.expr(
            f"transform(sequence(1, cast(event_id % {LEN_MOD} as int) + 1), "
            f"i -> cast((event_id * 31 + i * 7) % {VOCAB} as int))"
        ).alias("tokens"),
        (F.col("event_id") % TOK_MOD + 1).cast("int").alias("n_tok"),
        F.concat(F.lit("m"), F.col("event_id").cast("string")).alias("msgid"),
        F.when(F.col("event_id") % IDENT_EVERY == 0, F.lit("IDENT"))
        .otherwise(F.lit("POS"))
        .alias("rec_type"),
        # identity payload for counted-signature aggregation (reference
        # 'identities'/'destinations' arrays, transform/fragment.py:24-72)
        F.when(
            F.col("event_id") % IDENT_EVERY == 0,
            F.concat(F.lit("name_"), (F.col("event_id") % 5).cast("string")),
        ).alias("ident_value"),
        # second counted-record payload (reference fragments carry BOTH
        # 'identities' AND 'destinations' arrays, transform/fragment.py:24-72)
        F.when(
            F.col("event_id") % IDENT_EVERY == 0,
            F.concat(F.lit("dst_"), (F.col("event_id") % 4).cast("string")),
        ).alias("dest_value"),
    )


# DuckDB-compatible CTE producing the identical rows over the pre-registered
# `events` view. list/array values are compared via array_to_string in the
# queries that expose them.
TOKEN_STREAM_CTE = f"""
token_stream AS (
    SELECT
        'd' || CAST(user_id % {N_DOCS} AS VARCHAR)            AS doc_id,
        event_type                                            AS source,
        ts                                                    AS timestamp,
        list_transform(range(1, CAST(event_id % {LEN_MOD} AS INT) + 2),
                       i -> CAST((event_id * 31 + i * 7) % {VOCAB} AS INT))
                                                              AS tokens,
        CAST(event_id % {TOK_MOD} + 1 AS INT)                 AS n_tok,
        'm' || CAST(event_id AS VARCHAR)                      AS msgid,
        CASE WHEN event_id % {IDENT_EVERY} = 0
             THEN 'IDENT' ELSE 'POS' END                      AS rec_type,
        CASE WHEN event_id % {IDENT_EVERY} = 0
             THEN 'name_' || CAST(event_id % 5 AS VARCHAR)
             END                                              AS ident_value,
        CASE WHEN event_id % {IDENT_EVERY} = 0
             THEN 'dst_' || CAST(event_id % 4 AS VARCHAR)
             END                                              AS dest_value
    FROM events
)
"""


def read_token_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a materialized token table (date-partitioned parquet, Iceberg
    layout). Partition pruning on ``date`` is automatic."""
    return spark.read.parquet(path)
