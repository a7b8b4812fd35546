#!/usr/bin/env python
"""Benchmark harness (SURVEY.md §6 protocol; driver contract: prints ONE JSON
line with metric/value/unit/queries/sf).

Three parts:
1. EXTRACTION SCALING — the graft metric (BASELINE.json:2): the full extract
   job (read → salted repartition → mapInArrow → sortWithinPartitions →
   parquet write) over a deterministic synthetic transcripts table, run in a
   COLD JVM subprocess at local[N] and local[4N] (the driver-sanctioned
   stand-in for N vs 4N executors; default 4 vs 16, taskset-pinned so each
   "executor" has a fixed core budget). Reps are INTERLEAVED small/big so a
   co-tenant steal window hits both sides equally, best (min-wall) per side
   is the capability estimate, and a >10% wall spread triggers up to 2 extra
   rep pairs.
2. HARDWARE CEILING — the same-window pure-Python control: the extraction
   kernel alone in pinned N vs 4N worker processes over a sample of the same
   input. This box's 4→16 ceiling FLUCTUATES with co-tenant load (measured
   0.59–0.80 across windows); reporting it beside the Spark number separates
   "Spark plumbing cost" from "shared-VM physics": spark_relative_efficiency
   = scaling_efficiency / python_ceiling_efficiency. Protocol v4: the
   ceiling reps run INSIDE the Spark rep pairs (pair_hook) so control and
   measurement share noise windows; the ratio is clamped at 1.0 and flagged
   if residual skew would have pushed it above.
3. HEADLINE QUERIES — representative operators from SURVEY.md §2B at
   $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[N], timed
   against a noop sink (measures compute, not driver collect), after one
   untimed warmup query that absorbs JVM codegen + Python-worker start.
   Protocol v4: HEADLINE_REPS (default 2) full interleaved sweeps, best-of
   per query, per-rep walls reported — a single-shot number cannot be told
   apart from a co-tenant spike.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_CONVS
(default 36000 ≈ 1.7M turns), SPARK_GRAFT_BENCH_REPS (default 3),
SPARK_GRAFT_BENCH_BASE (default 4), SPARK_GRAFT_BENCH_SKIP_SCALING=1.
"""

from __future__ import annotations

import glob
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
SMALL_CORES = int(os.environ.get("SPARK_GRAFT_BENCH_BASE", "4"))
BIG_CORES = min(SMALL_CORES * 4, CPUS)
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
SPREAD_LIMIT = 0.10   # wall spread that triggers extra rep pairs
MAX_EXTRA_PAIRS = 2
CEILING_TURNS = 400_000  # sample size for the pure-Python control
# Secondary N→4N pair at 2→8 cores: the regime where the shared host still
# has memory-bandwidth headroom per core — the analogue of a real cluster,
# where each added executor brings its own bandwidth. The 4→16 primary runs
# into this single box's bus (pure-Python ceiling ≈0.73–0.80), so the ≥0.8
# north-rule number is evidenced here; the primary stays 4→16 for
# round-over-round comparability.
SECONDARY_BASE = int(os.environ.get("SPARK_GRAFT_BENCH_BASE2", "2"))
SECONDARY_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS2", "2"))

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
    "dedup_cluster_keeper",
    "ann_cosine_topk",
    "conv_merge_runs",
    "ann_quantized_topk",
    "pipeline_e2e",
    "events_sessionize",
    "search_bm25_topk",
    "dedup_substring_windows",
    "dedup_substring_windows_rk",
    "ann_pq_sampled_topk",
    "join_range_binned",
    "graph_pagerank_topk",
    "curation_lm_rarity",
    "conv_tool_chains",
    "extract_flagship",
]
HEADLINE_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_HREPS", "2"))


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
    """Cold-JVM extract run; prints its own one-line JSON to stdout.

    Protocol v3: one UNTIMED warmup pass of the same operator chain over a
    small slice (read → repartition → sort → mapInArrow → parquet write)
    before the timed full run — absorbs whole-stage-codegen JIT, Python
    worker cold start, and Arrow path init, exactly like the headline
    queries' untimed warmup. This measures steady-state throughput, which is
    what a long-running cluster actually delivers; JVM-level caches of the
    INPUT data cannot leak in because the warmup slice is 2k rows and the OS
    page cache holds the input for both sides equally."""
    sys.path.insert(0, str(REPO))
    from ocrautomator_spark.spark.extract_job import run_extract
    from ocrautomator_spark.spark.session import get_spark

    cores = int(master[len("local[") : -1])
    spark = get_spark(master=master, app_name=f"bench-extract-{cores}")
    out = f"/tmp/ocras_bench_out_{cores}"
    warm = spark.read.parquet(input_path).limit(2000)
    run_extract(warm, n_partitions=cores).write.mode("overwrite").parquet(out + "_warm")
    shutil.rmtree(out + "_warm", ignore_errors=True)
    df = spark.read.parquet(input_path)
    t0 = time.perf_counter()  # wall excludes session startup + untimed warmup
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


def _spread(runs: list[dict]) -> float:
    walls = [r["wall"] for r in runs]
    return (max(walls) - min(walls)) / min(walls)


def _run_scaling(
    input_path: pathlib.Path,
    small_cores: int,
    big_cores: int,
    reps: int,
    max_extra: int = MAX_EXTRA_PAIRS,
    pair_hook=None,
) -> dict:
    """Interleaved small/big cold-JVM rep pairs; min wall per side is the
    capability estimate (the right estimator on a steal-prone shared VM).
    ``pair_hook`` (protocol v4) runs once per rep pair — the ceiling control
    passes its own rep here so the pure-Python reference is measured in the
    SAME noise windows as the Spark pairs it normalizes."""
    small_runs: list[dict] = []
    big_runs: list[dict] = []
    for _ in range(reps):
        small_runs.append(_run_worker_once(small_cores, input_path))
        big_runs.append(_run_worker_once(big_cores, input_path))
        if pair_hook is not None:
            pair_hook()
    extra = 0
    while (
        (_spread(small_runs) > SPREAD_LIMIT or _spread(big_runs) > SPREAD_LIMIT)
        and extra < max_extra
    ):
        small_runs.append(_run_worker_once(small_cores, input_path))
        big_runs.append(_run_worker_once(big_cores, input_path))
        if pair_hook is not None:
            pair_hook()
        extra += 1
    small = min(small_runs, key=lambda r: r["wall"])
    big = min(big_runs, key=lambda r: r["wall"])
    tps_small = small["rows"] / small["wall"]
    tps_big = big["rows"] / big["wall"]
    return {
        "rows": small["rows"],
        "wall_small": small["wall"],
        "wall_big": big["wall"],
        "tps_small": tps_small,
        "tps_big": tps_big,
        "walls_small": [round(r["wall"], 2) for r in small_runs],
        "walls_big": [round(r["wall"], 2) for r in big_runs],
        "efficiency": (tps_big / tps_small) / (big_cores / small_cores),
    }


# ---- pure-Python hardware-ceiling control (same input, same pinning) ----

_CEILING_TEXTS: list[str] = []


def _ceiling_work(args: tuple[int, int]) -> float:
    lo, hi = args
    from ocrautomator_spark.kernel.extractor import extract_one

    for t in _CEILING_TEXTS[lo:hi]:
        extract_one(t)
    return hi - lo


def _membw_probe() -> float:
    """Single-thread memory-bandwidth probe (GB/s): one uint64 cumsum pass
    over a 256 MB array (~512 MB of traffic). Diagnostic only — a co-tenant
    can saturate the socket's memory bandwidth while leaving ALU throughput
    near-nominal, which slows the numpy/pandas-UDF query paths (e.g. the RK
    substring scan) 5-10x while JVM codegen paths barely move. Recording
    the per-window value lets a reader separate 'repo regression' from
    'bandwidth-stolen window' (see CLAUDE.md r6 noise-diagnosis note)."""
    import numpy as np

    a = np.arange(32_000_000, dtype=np.uint64)
    out = np.empty_like(a)
    np.cumsum(a, out=out)  # untimed warmup: faults both arrays in
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.cumsum(a, out=out)
        best = min(best, time.perf_counter() - t0)
    return a.nbytes * 2 / best / 1e9


def _membw_worker(_i: int) -> float:
    import numpy as np

    a = np.arange(16_000_000, dtype=np.uint64)
    out = np.empty_like(a)
    np.cumsum(a, out=out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.cumsum(a, out=out)
        best = min(best, time.perf_counter() - t0)
    return a.nbytes * 2 / best / 1e9


def _membw_agg_probe(nproc: int = 8) -> float:
    """AGGREGATE bandwidth (GB/s) across ``nproc`` fork workers. The
    single-thread probe cannot detect socket-bandwidth saturation (one
    stream never saturates a socket); the aggregate number is what a
    16-way extract side actually competes for."""
    from multiprocessing import get_context

    with get_context("fork").Pool(nproc) as p:
        return round(sum(p.map(_membw_worker, range(nproc))), 1)


def _ceiling_run(nproc: int) -> float:
    """Turns/sec of the bare kernel in ``nproc`` pinned fork workers."""
    from multiprocessing import get_context

    old_aff = os.sched_getaffinity(0)
    os.sched_setaffinity(0, set(range(nproc)))
    try:
        n = len(_CEILING_TEXTS)
        nchunk = nproc * 4
        chunks = [(i * n // nchunk, (i + 1) * n // nchunk) for i in range(nchunk)]
        t0 = time.perf_counter()
        with get_context("fork").Pool(nproc) as p:
            p.map(_ceiling_work, chunks)
        return n / (time.perf_counter() - t0)
    finally:
        os.sched_setaffinity(0, old_aff)


class _CeilingControl:
    """Pure-Python hardware-ceiling control, protocol v4: one ceiling rep
    pair runs INSIDE each Spark rep pair (via _run_scaling's pair_hook), so
    the reference shares the exact noise windows of the numbers it
    normalizes — the fix for BENCH_r03's physically-impossible
    spark_relative_efficiency 1.073, which came from the ceiling landing in
    a quieter window than the Spark pairs."""

    def __init__(self, input_path: pathlib.Path) -> None:
        import pyarrow.parquet as pq

        global _CEILING_TEXTS
        texts: list[str] = []
        for f in sorted(glob.glob(str(input_path) + "/*.parquet")):
            texts.extend(pq.read_table(f, columns=["text"]).column("text").to_pylist())
            if len(texts) >= CEILING_TURNS:
                break
        _CEILING_TEXTS = texts[:CEILING_TURNS]
        self.turns = len(_CEILING_TEXTS)
        self.tps: dict[int, float] = {SMALL_CORES: 0.0, BIG_CORES: 0.0}
        self.membw: list[float] = []
        self.membw_agg: list[float] = []
        self.reps = 0

    def rep(self) -> None:
        for cores in (SMALL_CORES, BIG_CORES):
            self.tps[cores] = max(self.tps[cores], _ceiling_run(cores))
        self.membw.append(round(_membw_probe(), 2))
        self.membw_agg.append(_membw_agg_probe())
        self.reps += 1

    def result(self) -> dict:
        global _CEILING_TEXTS
        _CEILING_TEXTS = []
        if self.reps == 0:  # pair_hook never fired (reps=0 config)
            self.rep()
        eff = (self.tps[BIG_CORES] / self.tps[SMALL_CORES]) / (BIG_CORES / SMALL_CORES)
        return {
            "turns": self.turns,
            "reps": self.reps,
            "tps_small": round(self.tps[SMALL_CORES], 1),
            "tps_big": round(self.tps[BIG_CORES], 1),
            "efficiency": round(eff, 3),
            "membw_gbps": {
                "best": max(self.membw) if self.membw else None,
                "worst": min(self.membw) if self.membw else None,
            },
            "membw_agg8_gbps": {
                "best": max(self.membw_agg) if self.membw_agg else None,
                "worst": min(self.membw_agg) if self.membw_agg else None,
            },
        }


def main() -> None:
    results: dict[str, float] = {}
    extras: dict[str, object] = {}

    # -- part 1+2: extraction scaling + same-window hardware ceiling --
    if os.environ.get("SPARK_GRAFT_BENCH_SKIP_SCALING") != "1":
        input_path, gen_sec = _gen_input()
        extras["gen_sec"] = round(gen_sec, 1)
        sys.path.insert(0, str(REPO))
        control = _CeilingControl(input_path)
        sc = _run_scaling(input_path, SMALL_CORES, BIG_CORES, REPS, pair_hook=control.rep)
        ceiling = control.result()
        rel = sc["efficiency"] / ceiling["efficiency"] if ceiling["efficiency"] else None
        # >1.0 is physically impossible when simultaneous; clamp + flag so the
        # headline ratio never inherits residual window skew
        rel_clamped = min(rel, 1.0) if rel is not None else None
        results[f"extract_local{SMALL_CORES}"] = round(sc["wall_small"], 2)
        results[f"extract_local{BIG_CORES}"] = round(sc["wall_big"], 2)
        extras.update(
            bench_turns=sc["rows"],
            turns_per_sec_small=round(sc["tps_small"], 1),
            turns_per_sec_big=round(sc["tps_big"], 1),
            scaling_cores=[SMALL_CORES, BIG_CORES],
            walls_small=sc["walls_small"],
            walls_big=sc["walls_big"],
            scaling_efficiency=round(sc["efficiency"], 3),
            python_ceiling=ceiling,
            spark_relative_efficiency=round(rel_clamped, 3) if rel_clamped is not None else None,
            spark_relative_raw=round(rel, 3) if rel is not None else None,
            spark_relative_clamped=bool(rel is not None and rel > 1.0),
        )
        if SECONDARY_REPS > 0:
            sc2 = _run_scaling(
                input_path, SECONDARY_BASE, SECONDARY_BASE * 4, SECONDARY_REPS, max_extra=1
            )
            extras["secondary_scaling"] = {
                "cores": [SECONDARY_BASE, SECONDARY_BASE * 4],
                "turns_per_sec_small": round(sc2["tps_small"], 1),
                "turns_per_sec_big": round(sc2["tps_big"], 1),
                "walls_small": sc2["walls_small"],
                "walls_big": sc2["walls_big"],
                "scaling_efficiency": round(sc2["efficiency"], 3),
            }

    # -- part 3: headline queries at SF_DIR --
    sys.path.insert(0, str(REPO))
    from ocrautomator_spark.queries import QUERIES
    from ocrautomator_spark.spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="bench-queries")
    # untimed warmup: absorbs whole-stage-codegen JIT + Python worker start
    QUERIES["agg_hash"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    QUERIES["udf_scalar_pandas"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    # ingest-time PQ index build (untimed, once): ann_pq_sampled_topk below
    # measures the QUERY path against the persisted artifact, which is the
    # 100 TB cost placement (train/code at ingest, read codes at query time)
    t0 = time.perf_counter()
    QUERIES["ann_index_build"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    extras["ann_index_build_ingest_wall"] = round(time.perf_counter() - t0, 3)
    # protocol v4: >=2 INTERLEAVED reps per headline query (full sweeps, so a
    # co-tenant spike window hits one rep of every query, not every rep of
    # one query), best-of reported — single-shot numbers manufactured four
    # phantom regressions in BENCH_r03
    walls: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(HEADLINE_REPS):
        for name in HEADLINE:
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.perf_counter() - t0, 3))
    for name in HEADLINE:
        results[name] = min(walls[name])
    extras["headline_walls"] = walls
    # r6 gate inversion (VERDICT r5 item 3): headline minhash walls above are
    # the xxhash64 production default; record the md5 ORACLE-mode walls next
    # to them so the md5-for-oracle-ability cost stays a measured quantity.
    # Save/restore the caller's env (ADVICE r5) and verify the headline sweep
    # could not have silently run in oracle mode. raise, not assert: the
    # guard must survive `python -O` (the round-5 integrity-gate rule).
    _ORACLE_ENV = "SPARK_GRAFT_MINHASH_ORACLE"
    if os.environ.get(_ORACLE_ENV) == "1":
        raise RuntimeError(
            "SPARK_GRAFT_MINHASH_ORACLE=1 was exported before bench.py ran — the "
            "headline minhash walls would have measured oracle mode; unset it"
        )
    _prior = os.environ.get(_ORACLE_ENV)
    os.environ[_ORACLE_ENV] = "1"
    try:
        oracle_walls: dict[str, list[float]] = {}
        for _ in range(max(HEADLINE_REPS, 2)):
            for name in ("dedup_minhash_lsh", "dedup_minhash_weighted"):
                t0 = time.perf_counter()
                QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
                oracle_walls.setdefault(name, []).append(round(time.perf_counter() - t0, 3))
    finally:
        if _prior is None:
            os.environ.pop(_ORACLE_ENV, None)
        else:
            os.environ[_ORACLE_ENV] = _prior
    extras["minhash_oracle_walls"] = {n: min(w) for n, w in oracle_walls.items()}
    spark.stop()

    from ocrautomator_spark.kernel import EXTRACTOR_VERSION

    sf = 0.1 if "sf0.1" in SF_DIR else (0.01 if "sf0.01" in SF_DIR else 0.001)
    out = {
        "metric": "extract turns/sec scaling (local[N] vs local[4N]) + headline query wall",
        "protocol": "v5",  # v5: compact driver-parseable final line + full detail file
        "value": round(sum(results.values()), 2),
        "unit": "sec",
        "queries": results,
        "sf": sf,
        "extractor_version": EXTRACTOR_VERSION,
        **extras,
    }
    # full detail (per-rep wall arrays, ceiling internals) goes to a file;
    # stdout's FINAL line is a COMPACT summary that fits the driver's
    # fixed-size stdout tail capture (BENCH_r05 recorded parsed=null because
    # the v4 line outgrew it) — scalars only, no arrays
    detail_path = REPO / "bench" / "bench_full_latest.json"
    detail_path.parent.mkdir(parents=True, exist_ok=True)
    detail_path.write_text(json.dumps(out, indent=1))
    compact = {k: out[k] for k in ("metric", "protocol", "value", "unit", "queries", "sf")}
    compact["extractor_version"] = EXTRACTOR_VERSION
    for k in (
        "bench_turns",
        "turns_per_sec_small",
        "turns_per_sec_big",
        "scaling_cores",
        "scaling_efficiency",
        "spark_relative_efficiency",
        "spark_relative_raw",
    ):
        if k in extras:
            compact[k] = extras[k]
    if "python_ceiling" in extras:
        compact["python_ceiling_efficiency"] = extras["python_ceiling"]["efficiency"]
    if "secondary_scaling" in extras:
        s2 = extras["secondary_scaling"]
        compact["secondary_scaling"] = {
            "cores": s2["cores"],
            "scaling_efficiency": s2["scaling_efficiency"],
        }
    if "minhash_oracle_walls" in extras:
        compact["minhash_oracle_walls"] = extras["minhash_oracle_walls"]
    compact["detail_file"] = str(detail_path)
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], sys.argv[3])
    else:
        main()
