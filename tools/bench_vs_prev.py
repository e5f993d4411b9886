#!/usr/bin/env python
"""Same-session paired HEAD-vs-previous-round bench (VERDICT r4 ask #1b).

Cross-window absolute bench numbers on this box are weather reports (the
r3->r4 "regression" was 21% CPU steal, adjudicated by the judge). The
ONLY trustworthy round-over-round signal is alternating fresh-JVM pairs
in ONE ambient window, both sides on identical input. This tool:

  1. resolves the previous round's code (default: the newest commit whose
     subject starts with "round N:" — the driver's round-close commit),
  2. checks it out into a temporary git worktree,
  3. alternates fresh JVMs HEAD, PREV, HEAD, PREV ... (each JVM runs the
     heavy-query list once, in order, after a warmup query),
  4. prints per-query medians + HEAD/PREV ratios as JSON and a markdown
     table ready for BENCH/BASELINE.md, stamped with the host weather
     (loadavg + /proc/stat steal) so the window itself is on record.

Usage:
    python tools/bench_vs_prev.py                  # 3 pairs, default list
    python tools/bench_vs_prev.py --prev <ref> --pairs 2 \
        --queries segmenter_full_segments,seg_sessionize

The probe subprocess imports the engine via PYTHONPATH, so the previous
round needs no files from HEAD (and vice versa).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "segmenter_full_segments",  # flagship stateful pipeline
    "seg_sessionize",           # pure-Catalyst control (unchanged code
                                # moving here = ambient, not engine)
    "segment_vessel_daily",
    "satellite_offsets_full",
    "ann_bucketed_topk",
    "ann_ivf_topk",
]

_PROBE = r"""
import json, os, sys, time
queries = json.loads(os.environ["BVP_QUERIES"])
sf_dir = os.environ["BVP_SF_DIR"]
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
from pipe_segment_spark.queries import QUERIES as REGISTRY
from pipe_segment_spark.session import build_session
spark = build_session(app_name="bench-vs-prev", cores=cpus)
spark.sparkContext.setLogLevel("ERROR")
REGISTRY["token_stream"](spark, sf_dir).count()  # JVM/Arrow warmup
out = {}
for q in queries:
    t0 = time.perf_counter()
    REGISTRY[q](spark, sf_dir).count()
    out[q] = round(time.perf_counter() - t0, 3)
print("BVP_RESULT " + json.dumps(out))
spark.stop()
"""


def _steal_ticks():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:9]]
    return vals[7], sum(vals)


def run_probe(code_path: str, queries: list[str], sf_dir: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = code_path
    env["BVP_QUERIES"] = json.dumps(queries)
    env["BVP_SF_DIR"] = sf_dir
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE],
        env=env,
        cwd=tempfile.gettempdir(),  # never resolve imports from a repo cwd
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("BVP_RESULT "):
            return json.loads(line[len("BVP_RESULT "):])
    raise RuntimeError(
        f"probe at {code_path} produced no result; stderr tail:\n"
        + proc.stderr[-2000:]
    )


def resolve_prev_ref(explicit: str | None) -> str:
    if explicit:
        return subprocess.check_output(
            ["git", "rev-parse", explicit], cwd=REPO, text=True
        ).strip()
    head = subprocess.check_output(
        ["git", "rev-parse", "HEAD"], cwd=REPO, text=True
    ).strip()
    out = subprocess.check_output(
        ["git", "log", "--format=%H %s", "-200"], cwd=REPO, text=True
    )
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if subject.startswith("round ") and ":" in subject.split(" ", 2)[1]:
            if sha == head:
                # HEAD itself is a round-close commit: benchmarking HEAD
                # against HEAD would report flat ~1.0 ratios that look
                # like "no regression" (ADVICE r5) — take the next match
                continue
            return sha
    raise SystemExit(
        "no 'round N:' driver commit found; pass --prev <ref> explicitly"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev", default=None, help="git ref of previous round")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()
    queries = [q for q in args.queries.split(",") if q]

    prev_sha = resolve_prev_ref(args.prev)
    wt = tempfile.mkdtemp(prefix="bench_prev_wt_")
    subprocess.check_call(
        ["git", "worktree", "add", "--detach", wt, prev_sha],
        cwd=REPO,
        stdout=subprocess.DEVNULL,
    )
    try:
        load0 = os.getloadavg()
        st0, tot0 = _steal_ticks()
        head_runs: list[dict] = []
        prev_runs: list[dict] = []
        for i in range(args.pairs):
            print(f"pair {i + 1}/{args.pairs}: HEAD ...", file=sys.stderr)
            head_runs.append(run_probe(REPO, queries, args.sf_dir))
            print(f"pair {i + 1}/{args.pairs}: PREV ...", file=sys.stderr)
            prev_runs.append(run_probe(wt, queries, args.sf_dir))
        st1, tot1 = _steal_ticks()
        host = {
            "load_start_1m": round(load0[0], 2),
            "load_end_1m": round(os.getloadavg()[0], 2),
            "cpu_steal_pct": round(100.0 * (st1 - st0) / (tot1 - tot0), 1)
            if tot1 > tot0
            else None,
        }
        table = {}
        for q in queries:
            h = statistics.median(r[q] for r in head_runs)
            p = statistics.median(r[q] for r in prev_runs)
            table[q] = {
                "head_median_sec": round(h, 3),
                "prev_median_sec": round(p, 3),
                "head_over_prev": round(h / p, 3) if p else None,
                "head_all": [r[q] for r in head_runs],
                "prev_all": [r[q] for r in prev_runs],
            }
        print(
            json.dumps(
                {
                    "prev_sha": prev_sha,
                    "pairs": args.pairs,
                    "sf_dir": args.sf_dir,
                    "host": host,
                    "per_query": table,
                }
            )
        )
        # markdown table for BENCH/BASELINE.md
        print("\n| query | HEAD med (s) | prev med (s) | HEAD/prev |")
        print("|---|---|---|---|")
        for q, r in table.items():
            print(
                f"| {q} | {r['head_median_sec']} | {r['prev_median_sec']} "
                f"| {r['head_over_prev']} |"
            )
        print(
            f"\n(prev={prev_sha[:9]}, {args.pairs} alternating fresh-JVM "
            f"pairs, load {host['load_start_1m']}->{host['load_end_1m']}, "
            f"steal {host['cpu_steal_pct']}%)"
        )
    finally:
        subprocess.call(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO,
            stdout=subprocess.DEVNULL,
        )


if __name__ == "__main__":
    main()
