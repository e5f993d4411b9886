#!/usr/bin/env python
"""spark-submit entrypoint for the segmenter (batch + streaming).

Reference analog: the ``pipe segment`` CLI (cli/cli.py:88-97,
cli/commands/segment.py:74-116). Launch:

    spark-submit --py-files pipe_segment_spark.zip jobs/run_segment.py \
        --input /path/to/token_table --output /path/to/out \
        --mode batch --max-gap-hours 6 --max-dtok-rate 30

    spark-submit --py-files pipe_segment_spark.zip jobs/run_segment.py \
        --input /path/to/stream_dir --output /path/to/out \
        --mode stream --checkpoint /path/to/ckpt --watermark "1 hour"

Build the zip with:  make pyfiles   (zip -r pipe_segment_spark.zip
pipe_segment_spark). On a cluster, drop the local[*] master via normal
spark-submit --master flags; the session builder only sets master when not
already configured by the launcher.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv):
    from pipe_segment_spark.cli import parse_segmenter_params, valid_daterange

    p = argparse.ArgumentParser(description="pipe-segment-spark segmenter")
    p.add_argument("--input", required=True, help="token table path (parquet)")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--mode", choices=["batch", "stream"], default="batch")
    p.add_argument("--checkpoint", help="stream checkpoint dir (stream mode)")
    p.add_argument(
        "--segmenter-params",
        type=parse_segmenter_params,
        default=None,
        help="'max_gap_hours:6, max_dtok_rate:30' or JSON object "
        "(reference --segmenter_params surface); overrides the individual "
        "threshold flags",
    )
    p.add_argument(
        "--date-range",
        type=valid_daterange,
        default=None,
        help="YYYY-MM-DD,YYYY-MM-DD inclusive event-date filter (reference "
        "--date_range)",
    )
    p.add_argument("--watermark", default="0 seconds")
    p.add_argument(
        "--stream-mode",
        choices=["low_latency", "day_close", "sorted_prefix", "tws_sorted_prefix"],
        default="low_latency",
        help="stream mode emission contract: low_latency (tagged rows emit "
        "per microbatch; batch-identity for in-order feeds), day_close "
        "(whole-day replay at watermark close; batch-identity under "
        "arbitrary intra-day disorder), sorted_prefix (incremental "
        "watermark-confirmed release; day_close's identity guarantee at "
        "near-low_latency emission), tws_sorted_prefix (EXPERIMENTAL: same "
        "semantics on the Spark 4 transformWithState operator — append-only "
        "RocksDB ListState buffer, per-batch state I/O bounded by the "
        "arriving batch + released suffix; the operator path needs "
        "google.protobuf in the Python env and has only fake-state unit "
        "coverage where protobuf is absent)",
    )
    p.add_argument(
        "--available-now",
        action="store_true",
        help="stream mode: drain currently-available input, then exit "
        "(the reference's daily incremental run, resumable via --checkpoint)",
    )
    p.add_argument("--max-gap-hours", type=float, default=6.0)
    p.add_argument("--max-dtok-rate", type=float, default=30.0)
    p.add_argument("--buffer-hours", type=float, default=0.5)
    p.add_argument("--hours-exp", type=float, default=0.5)
    p.add_argument("--salted", action="store_true", help="salted fragmenter")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv or sys.argv[1:])

    from pyspark.sql import SparkSession

    from pipe_segment_spark.config import SegmenterParams

    params = args.segmenter_params or SegmenterParams(
        max_gap_hours=args.max_gap_hours,
        max_dtok_rate=args.max_dtok_rate,
        buffer_hours=args.buffer_hours,
        hours_exp=args.hours_exp,
    )

    spark = (
        SparkSession.builder.appName("pipe-segment-spark")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    if args.mode == "batch":
        from pipe_segment_spark.pipeline import run_batch_pipeline

        records = spark.read.parquet(args.input)
        if args.date_range:
            from pyspark.sql import functions as F

            lo, hi = args.date_range
            records = records.where(
                F.to_date("timestamp").between(str(lo), str(hi))
            )
        out = run_batch_pipeline(records, params)
        out.segments.write.mode("overwrite").parquet(f"{args.output}/segments")
        out.segmap.write.mode("overwrite").parquet(f"{args.output}/segmap")
        out.fragments.write.mode("overwrite").parquet(f"{args.output}/fragments")
        out.tagged_records.write.mode("overwrite").parquet(
            f"{args.output}/messages"
        )
    else:
        if not args.checkpoint:
            raise SystemExit("--checkpoint required in stream mode")
        from pipe_segment_spark.streaming.segmenter_stream import (
            INPUT_SCHEMA_DDL,
            stream_segment,
        )
        from pipe_segment_spark.streaming.sink import idempotent_batch_writer

        stream = (
            spark.readStream.schema(INPUT_SCHEMA_DDL)
            .option("recursiveFileLookup", "true")
            .parquet(args.input)
        )
        if args.date_range:
            from pyspark.sql import functions as F

            lo, hi = args.date_range
            stream = stream.where(
                F.to_date("timestamp").between(str(lo), str(hi))
            )
        out = stream_segment(
            stream, params, watermark=args.watermark, mode=args.stream_mode
        )
        writer = (
            out.writeStream.foreachBatch(idempotent_batch_writer(args.output))
            .option("checkpointLocation", args.checkpoint)
        )
        if args.available_now:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
        q.awaitTermination()

    spark.stop()


if __name__ == "__main__":
    main()
