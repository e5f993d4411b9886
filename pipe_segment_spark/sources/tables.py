"""Storage-agnostic table API — the Iceberg-layout persistence layer.

The production design is Iceberg tables partitioned by ``days(timestamp)``
(the reference's date-sharded BigQuery tables, utils/bq_tools.py:71-90 —
shard pruning at read, truncate-shard-then-write idempotent reruns,
pipeline.py:142-156). The Iceberg runtime jar isn't available offline in
this sandbox, so the same semantics run over directory-partitioned parquet:

- write: dynamic partition overwrite on ``date=YYYY-MM-DD`` directories —
  re-running a date range atomically replaces exactly those shards
  (reference WRITE_TRUNCATE per shard).
- read: Catalyst prunes ``date`` partitions from WHERE clauses (asserted in
  tests/test_tables.py — the physical plan's partition filters).

Swapping in Iceberg is a one-line change per call site
(``.writeTo(t).overwritePartitions()`` / ``spark.read.table(t)``) — every
partition key, pruning predicate and overwrite boundary is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str = "timestamp", mode: str = "overwrite"
) -> None:
    """Idempotent date-sharded write (reference WriteSink,
    transform/write_sink.py:5-27): dynamic overwrite replaces only the
    partitions present in ``df``."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.withColumn("date", F.to_date(F.col(ts_col)))
            .write.mode(mode)
            .partitionBy("date")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_date_range(
    spark: SparkSession, path: str, start_date: str, end_date: str
) -> DataFrame:
    """Partition-pruned scan of a date range (reference ReadMessages shard
    pruning, transform/read_messages.py:12-16) — the BETWEEN on the
    partition column reaches the file listing, not the row scan."""
    return spark.read.parquet(path).where(
        F.col("date").between(F.lit(start_date), F.lit(end_date))
    )


def delete_date_range(
    spark: SparkSession, path: str, start_date: str, end_date: str
) -> None:
    """Range delete = overwrite the range with empty (reference
    SatelliteOffsetsWrite delete-then-append, satellite_offsets.py:119-162).
    With Iceberg this is ``DELETE WHERE`` / ``replaceWhere``; on directory
    parquet we drop the partition dirs."""
    import shutil
    from datetime import date, timedelta

    d0 = date.fromisoformat(start_date)
    d1 = date.fromisoformat(end_date)
    cur = d0
    while cur <= d1:
        shutil.rmtree(f"{path}/date={cur.isoformat()}", ignore_errors=True)
        cur += timedelta(days=1)
