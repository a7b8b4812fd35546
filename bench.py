#!/usr/bin/env python
"""Benchmark harness (SURVEY.md §6 protocol; driver contract: prints ONE JSON
line with metric/value/unit/queries/sf).

Two parts:
1. EXTRACTION SCALING — the graft metric (BASELINE.json:2): the full extract
   job (read → salted repartition → mapInPandas → sortWithinPartitions →
   parquet write) over a deterministic synthetic transcripts table, run in a
   COLD JVM subprocess at local[8] and local[N] (N=SPARK_GRAFT_CPUS, default
   32) — the driver-sanctioned stand-in for N vs 4N executors. Reports
   turns/sec at both and scaling efficiency (target ≥ 0.8). The input is
   sized for ≥60 s of work at local[8] so Python-worker startup noise doesn't
   flatter the small run.
2. HEADLINE QUERIES — representative operators from SURVEY.md §2B at
   $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[N], timed
   against a noop sink (measures compute, not driver collect).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_CONVS
(default 36000 ≈ 1.7M turns), SPARK_GRAFT_BENCH_SKIP_SCALING=1.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", min(os.cpu_count() or 8, 32)))
BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "36000"))
# The N-vs-4N pair. Default base N=4: each "executor" gets a PINNED core
# budget (taskset 0..cores-1), because unpinned local[N] lets JVM helper
# threads and Python workers borrow the host's idle cores, silently inflating
# small-N throughput — a real N-core executor has no spare cores to borrow.
# BASELINE.md records the measured hardware ceiling for this box.
SMALL_CORES = int(os.environ.get("SPARK_GRAFT_BENCH_BASE", "4"))
BIG_CORES = min(SMALL_CORES * 4, CPUS)
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

HEADLINE = [
    "agg_hash",
    "join_inner_hash",
    "join_broadcast",
    "join_asof",
    "win_rank",
    "win_tumbling",
    "topk_per_group",
    "doc_fingerprint",
    "text_quality",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "extract_flagship",
]


def _input_path() -> pathlib.Path:
    return pathlib.Path(f"/tmp/ocras_bench_transcripts_{BENCH_CONVS}")


def _gen_input() -> tuple[pathlib.Path, float]:
    """Generate (once) the deterministic bench transcripts table."""
    path = _input_path()
    if (path / "_SUCCESS").exists():
        return path, 0.0
    sys.path.insert(0, str(REPO))
    from ocrautomator_spark.spark.session import get_spark
    from ocrautomator_spark.spark.synth_job import synth_transcripts_df

    t0 = time.perf_counter()
    spark = get_spark(master=f"local[{CPUS}]", app_name="bench-gen")
    synth_transcripts_df(spark, BENCH_CONVS, n_partitions=CPUS * 4).write.mode(
        "overwrite"
    ).parquet(str(path))
    spark.stop()
    return path, time.perf_counter() - t0


def _worker(master: str, input_path: str) -> None:
    """Cold-JVM extract run; prints its own one-line JSON to stdout."""
    sys.path.insert(0, str(REPO))
    from ocrautomator_spark.spark.extract_job import run_extract
    from ocrautomator_spark.spark.session import get_spark

    cores = int(master[len("local[") : -1])
    spark = get_spark(master=master, app_name=f"bench-extract-{cores}")
    out = f"/tmp/ocras_bench_out_{cores}"
    df = spark.read.parquet(input_path)
    t0 = time.perf_counter()  # wall excludes session startup, per protocol
    run_extract(df, n_partitions=cores * 4).write.mode("overwrite").parquet(out)
    wall = time.perf_counter() - t0
    rows = spark.read.parquet(out).count()
    spark.stop()
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"wall": wall, "rows": rows, "cores": cores}))


def _run_worker_once(cores: int, input_path: pathlib.Path) -> dict:
    cmd = [sys.executable, __file__, "--worker", f"local[{cores}]", str(input_path)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd  # fixed core budget
    proc = subprocess.run(cmd, capture_output=True, text=True, check=False, cwd=str(REPO))
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench worker local[{cores}] failed:\n{proc.stderr[-3000:]}")


def _run_worker(cores: int, input_path: pathlib.Path) -> dict:
    """Best (min wall) of REPS cold-JVM runs — min is the right estimator for
    capability on a steal-prone shared VM (BASELINE.md protocol)."""
    runs = [_run_worker_once(cores, input_path) for _ in range(REPS)]
    best = min(runs, key=lambda r: r["wall"])
    best["walls"] = [round(r["wall"], 2) for r in runs]
    return best


def main() -> None:
    results: dict[str, float] = {}
    extras: dict[str, object] = {}

    # -- part 1: extraction scaling (cold JVM per level) --
    if os.environ.get("SPARK_GRAFT_BENCH_SKIP_SCALING") != "1":
        input_path, gen_sec = _gen_input()
        extras["gen_sec"] = round(gen_sec, 1)
        small = _run_worker(SMALL_CORES, input_path)
        big = _run_worker(BIG_CORES, input_path)
        tps_small = small["rows"] / small["wall"]
        tps_big = big["rows"] / big["wall"]
        eff = (tps_big / tps_small) / (BIG_CORES / SMALL_CORES)
        results[f"extract_local{SMALL_CORES}"] = round(small["wall"], 2)
        results[f"extract_local{BIG_CORES}"] = round(big["wall"], 2)
        extras.update(
            bench_turns=small["rows"],
            turns_per_sec_small=round(tps_small, 1),
            turns_per_sec_big=round(tps_big, 1),
            scaling_cores=[SMALL_CORES, BIG_CORES],
            walls_small=small.get("walls"),
            walls_big=big.get("walls"),
            scaling_efficiency=round(eff, 3),
        )

    # -- part 2: headline queries at SF_DIR --
    sys.path.insert(0, str(REPO))
    from ocrautomator_spark.queries import QUERIES
    from ocrautomator_spark.spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="bench-queries")
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        results[name] = round(time.perf_counter() - t0, 3)
    spark.stop()

    from ocrautomator_spark.kernel import EXTRACTOR_VERSION

    sf = 0.1 if "sf0.1" in SF_DIR else (0.01 if "sf0.01" in SF_DIR else 0.001)
    out = {
        "metric": "extract turns/sec scaling (local[N] vs local[4N]) + headline query wall",
        "value": round(sum(results.values()), 2),
        "unit": "sec",
        "queries": results,
        "sf": sf,
        "extractor_version": EXTRACTOR_VERSION,
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], sys.argv[3])
    else:
        main()
