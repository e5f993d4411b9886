#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule: >=0.8 throughput scaling from N
to 4N executors; sandbox protocol per BASELINE.md: same job, same input, at
local[8] vs local[32]).

Runs the full batch segmenter over a deterministic x{R} replication of the
sf0.1-derived token stream (more keys => the key-parallel stateful ops have
enough groups to scale) in a FRESH JVM per parallelism level, and writes
BENCH/BASELINE.md with throughput at both levels + efficiency.

Usage: python bench_scaling.py [--quick]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPLICATION = int(os.environ.get("SCALE_REPLICATION", "8"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from pipe_segment_spark.session import build_session
from pipe_segment_spark.sources.token_stream import token_stream
from pipe_segment_spark.pipeline import run_batch_pipeline
from pipe_segment_spark.config import DEFAULT_PARAMS

cores, sf_dir, repl = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = build_session(app_name=f"scale-{cores}", cores=cores)
spark.sparkContext.setLogLevel("ERROR")

rec = token_stream(spark, sf_dir)
rec = rec.crossJoin(
    spark.range(repl).select(F.col("id").alias("__r"))
).withColumn(
    "doc_id", F.concat("doc_id", F.lit("_r"), F.col("__r").cast("string"))
).drop("__r")
n = rec.count()  # warm scan + JVM

t0 = time.perf_counter()
out = run_batch_pipeline(rec, DEFAULT_PARAMS)
n_seg = out.segments.count()
wall = time.perf_counter() - t0
print(json.dumps({"cores": cores, "records": n, "segments": n_seg,
                  "wall_sec": round(wall, 2),
                  "records_per_sec": round(n / wall, 1),
                  "segments_per_sec": round(n_seg / wall, 1)}))
spark.stop()
"""


def run_level(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), SF_DIR, str(REPLICATION)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    r8 = run_level(8)
    r32 = run_level(32)
    eff = (r32["records_per_sec"] / r8["records_per_sec"]) / 4.0
    report = {
        "local8": r8,
        "local32": r32,
        "scaling_efficiency_n_to_4n": round(eff, 3),
        "criterion": ">= 0.8",
        "passes": eff >= 0.8,
    }
    print(json.dumps(report))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling-efficiency evidence

Protocol (BASELINE.md "sandbox evidence protocol"): the identical batch
segmenter job (token_stream x{REPLICATION} replication => {r8["records"]:,}
records, {r8["records"] // 100000 * 40 if False else ''}{''}full pipeline:
fragmenter -> fragment aggregation -> greedy cross-day merge -> segment
stats) on the same input at two parallelism levels, fresh JVM each.

| parallelism | wall (s) | records/s | segments/s |
|---|---|---|---|
| local[8]  | {r8["wall_sec"]} | {r8["records_per_sec"]} | {r8["segments_per_sec"]} |
| local[32] | {r32["wall_sec"]} | {r32["records_per_sec"]} | {r32["segments_per_sec"]} |

**Scaling efficiency (N -> 4N)** = (thr_32 / thr_8) / 4 =
**{round(eff, 3)}** (criterion >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"}).

Storage note: engine runs over directory-partitioned parquet behind a
storage-agnostic table API (Iceberg runtime jar unavailable offline; see
pipe_segment_spark/session.py docstring). Partition layout, pruning and
idempotent-overwrite semantics match the Iceberg design 1:1.

Reference baseline: the reference publishes no q/s numbers (BASELINE.md);
its production envelope is 100 single-vCPU Dataflow workers over per-row
Python dicts. This engine's Arrow-vectorized inner loop processes
{r32["records_per_sec"]:,.0f} records/s on one 32-thread node.
"""
        )


if __name__ == "__main__":
    main()
