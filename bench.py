"""Benchmark harness: runs EVERY `queries()` entry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec}, "sf": 0.1}

"Headline = everything" (VERDICT r9 #4): the bench set is the
queries() dict itself — oracle-backed and rows-only alike — so a new
query can never be silently unbenched; the script asserts the count
matches the registry.

Big results are forced with the no-op writer (all partitions
materialize, nothing collected to the driver); tiny aggregates use
collect(). A warm-up query runs first so JVM/codegen startup isn't
billed to the first benchmark entry.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from safedata_pipeline_spark.session import get_spark

SMALL_RESULT_ROWS = 10000  # collect() below this, noop-write above


def force(df) -> int:
    """Materialize a DataFrame fully; return row count when cheap."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def _registry_key_literals() -> list:
    """Independent count of queries(): the dict-key string literals in
    the function's source, via ast. Catches duplicate literals (which
    dict construction silently collapses) and any drift between source
    and the returned mapping."""
    import ast

    here = os.path.dirname(os.path.abspath(__file__))
    src = open(os.path.join(here, "__spark_entry__.py")).read()
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.FunctionDef) and node.name == "queries":
            # Anchor the scan to the RETURNED dict (ADVICE r11: the
            # first ast.Dict in the body could be an unrelated helper
            # mapping and would silently become the tally).
            for n in ast.walk(node):
                if isinstance(n, ast.Return) and isinstance(
                    n.value, ast.Dict
                ):
                    return [
                        k.value
                        for k in n.value.keys
                        if isinstance(k, ast.Constant)
                    ]
    raise AssertionError("queries() returned dict literal not found")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("safedata-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    # the bench set IS the registry: every queries() entry, in dict
    # order (the driver-window 50 first). The count is asserted
    # against an INDEPENDENT tally — the dict-key string literals in
    # __spark_entry__.py's queries() source (ADVICE r10: comparing a
    # dict to itself was vacuous and could not catch duplicate key
    # literals, which silently collapse).
    names = list(qs)
    key_literals = _registry_key_literals()
    dup = sorted({k for k in key_literals if key_literals.count(k) > 1})
    assert not dup, f"duplicate key literals in queries(): {dup}"
    assert len(names) == len(key_literals), (
        f"queries() returned {len(names)} entries but its source has "
        f"{len(key_literals)} key literals"
    )

    # warm-up (JVM, codegen, parquet footer caches) — plus one pass
    # that exercises the shared heavyweight machinery (explode →
    # groupBy → eager localCheckpoint → window → broadcast join) on a
    # synthetic frame: analyzer/codegen first-use JIT is SESSION-level
    # cost, and without this it lands entirely in query #1's rep 1
    # (basic_stats rep-1 measured ~2x its steady state from it)
    qs["value_counts"](spark, sf_dir).collect()
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    _w = spark.range(200000).select(
        "id", _F.explode(_F.array(_F.lit("a"), _F.lit("b"))).alias("t")
    )
    _g = _w.groupBy("t", (_F.col("id") % 97).alias("k")).agg(
        _F.count(_F.lit(1)).alias("c")
    ).localCheckpoint(eager=True)
    _win = _W.partitionBy("t").orderBy("k").rowsBetween(
        _W.unboundedPreceding, 0
    )
    _g.select("t", "k", _F.sum("c").over(_win).alias("cum")).join(
        _F.broadcast(_g.groupBy("t").agg(_F.sum("c").alias("n"))), "t"
    ).write.format("noop").mode("overwrite").save()
    # Arrow/Python-worker warmup (VERDICT r13 #2): the first
    # mapInPandas query otherwise pays Python worker spawn + numpy /
    # codec import on every core — jpeg_pixel_stats read 17.0s cold in
    # BENCH_r13.json vs 1.1-1.8s warm, a pure artifact of the worker
    # cold start being billed to whichever Arrow query runs first.
    # One tiny mapInPandas over 32 pinned splits spawns the workers
    # and front-loads the heavyweight imports (reused afterwards:
    # spark.python.worker.reuse defaults true).
    def _arrow_warm(it):
        import numpy  # noqa: F401

        from safedata_pipeline_spark.operators import jpeg_codec  # noqa: F401

        for pdf in it:
            yield pdf

    spark.range(0, 32, 1, 32).mapInPandas(_arrow_warm, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    # REAL-plan warmup (VERDICT r12 #2, widened per ADVICE r13): the
    # generic pass above warms session-level JIT but not each query's
    # OWN analyzer/codegen work — basic_stats' 13.8s cold-rep tail
    # survived it. Run every FIRST-WINDOW query (the driver-window
    # prefix of the registry) once at the smallest fixture (~50-500
    # rows: full plan-analysis cost, negligible execution) so their
    # plan shapes are hot before rep 1 is timed.
    _warm_dir = os.environ.get(
        "SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001"
    )
    WINDOW = 50  # the driver correctness window = first 50 dict keys
    if os.path.isdir(_warm_dir):
        for _wq in names[:WINDOW]:
            try:
                force(qs[_wq](spark, _warm_dir))
            except Exception:
                pass  # warmup must never fail the bench

    # host-speed canary (VERDICT r12 #3): a FIXED, engine-independent
    # synthetic workload — seeded range → modular projection → one
    # 100003-key shuffle+agg over 32 pinned splits — timed after
    # warmup and recorded as canary_sec. Hosts drift 1.3x between
    # rounds and ~16% within a session; round-over-round comparisons
    # should be read as canary-normalized ratios, making each BENCH
    # artifact self-describing without a worktree A/B.
    def _canary_once() -> float:
        t0 = time.time()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select(
                (_F.col("id") % 100003).alias("k"),
                ((_F.col("id") * 2654435761) % 2147483647).alias("v"),
            )
            .groupBy("k")
            .agg(_F.sum("v").alias("s"), _F.count(_F.lit(1)).alias("c"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.time() - t0

    _canary_reps = sorted(_canary_once() for _ in range(3))
    canary_sec = round(_canary_reps[1], 3)

    # memory-subsystem canary (AB_r12_r13 finding: the shuffle canary
    # under-weights page-fault-bound work — basic_stats ran 2.3x slow
    # on a day the shuffle canary read near-normal). Raw anonymous
    # mmap per probe (glibc arena reuse would hide the fault rate
    # after the first malloc burst); touches every 4 KiB page of
    # 64 MiB. Healthy host ~0.06s (~1.1 GB/s); the degraded state
    # measured this round would read seconds.
    def _canary_alloc_once() -> float:
        import mmap

        size = 64 * 1024 * 1024
        t0 = time.time()
        m = mmap.mmap(-1, size)
        for off in range(0, size, 4096):
            m[off] = 1
        m.close()
        return time.time() - t0

    _alloc_reps = sorted(_canary_alloc_once() for _ in range(3))
    canary_alloc_sec = round(_alloc_reps[1], 4)

    # job-chain canary (round-14 finding, closing the AB_r12_r13 open
    # attribution): the axis that eluded BOTH prior canaries is
    # per-JOB overhead — scheduler launch + eager localCheckpoint
    # block-manager round-trips. A fixed chain of 12 tiny
    # groupBy→localCheckpoint→count jobs measured 3.7-7.5s on the
    # degraded host state (≈200-300ms/job) while the shuffle canary
    # read near-normal and the alloc probe read healthy — and it
    # co-moved with basic_stats (6.0-15.3s over the same reps), which
    # composes dozens of such jobs. Recorded every round so bar
    # normalization can ride the axis the profiling queries actually
    # ride.
    def _canary_chain_once() -> float:
        t0 = time.time()
        for _ in range(12):
            dfc = spark.range(0, 20000, 1, 8).select(
                (_F.col("id") % 97).alias("k")
            )
            dfc.groupBy("k").count().localCheckpoint(eager=True).count()
        return time.time() - t0

    _chain_reps = sorted(_canary_chain_once() for _ in range(3))
    canary_chain_sec = round(_chain_reps[1], 3)

    # median-of-N per query: single-shot timings on a loaded shared box
    # swung 14–32s for identical code (VERDICT r4 #2); the median of
    # three fresh executions pins the number to the plan, not the
    # scheduler's luck. Reps are sequential per query so each rep pays
    # the same cache state; rep 1 (codegen JIT) is naturally discarded
    # by the median whenever the steady state is faster.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    import gc

    load_start = list(os.getloadavg())
    t_run0 = time.time()
    for name in names:
        # measurement hygiene: the 160+ preceding queries leave
        # localCheckpoint blocks alive until their Python DataFrames
        # are collected and py4j's cleanup thread drops the JVM refs.
        # Collecting before each query's rep loop stops block-manager
        # pressure from earlier (unrelated) queries bleeding into this
        # query's median (r6 saw 30-49% swings on late-order dedup
        # queries that bisect to identical code).
        gc.collect()
        samples = []
        for _ in range(reps):
            t0 = time.time()
            force(qs[name](spark, sf_dir))
            samples.append(time.time() - t0)
        timings[name] = round(sorted(samples)[len(samples) // 2], 3)
        spread[name] = [round(min(samples), 3), round(max(samples), 3)]

    total = round(sum(timings.values()), 3)

    # END-of-sweep canaries (VERDICT r13 "What's wrong" #4): the r13
    # driver record showed canary 1.001 at START while loadavg rose
    # 3.3->5.7 DURING the run — a loaded tail was invisible. Re-running
    # all three probes after the sweep makes it self-evident: a run is
    # trustworthy when start AND end canaries are healthy; a degraded
    # end canary marks the tail (and its per-query medians) as loaded.
    _canary_end = sorted(_canary_once() for _ in range(3))
    _alloc_end = sorted(_canary_alloc_once() for _ in range(3))
    _chain_end = sorted(_canary_chain_once() for _ in range(3))
    canary_sec_end = round(_canary_end[1], 3)
    canary_alloc_sec_end = round(_alloc_end[1], 4)
    canary_chain_sec_end = round(_chain_end[1], 3)

    # canary-normalized perf bars (VERDICT r13 "What's missing" #1):
    # absolute per-query seconds are not decidable on a host that
    # drifts 2.3x on axes the canaries under-weight, so each bar is
    # BASE seconds at the reference host state, scaled by the most
    # degraded canary ratio. References: shuffle canary 0.45s and
    # alloc probe 0.05s/64MiB (the healthy exclusive readings in
    # AB_r12_r13.json post_close_spot_checks), chain canary 2.5s
    # (back-derived: today's exclusive (chain, basic_stats) pairs
    # cross-ratioed to the r12 controlled 4.33s). BASE values are the
    # r12 controlled medians — the numbers the old absolute bars were
    # specified from. A bar PASSES when the query's median is within
    # BASE x norm; the artifact records every term so any future host
    # state can re-derive the verdict.
    PERF_BARS = {"basic_stats": 4.5, "robust_stats": 6.9}
    CANARY_REFS = {"canary": 0.45, "alloc": 0.05, "chain": 2.5}
    norm = max(
        canary_sec / CANARY_REFS["canary"],
        canary_alloc_sec / CANARY_REFS["alloc"],
        canary_chain_sec / CANARY_REFS["chain"],
        1.0,
    )
    perf_bars = {
        q: {
            "sec": timings[q],
            "base_sec": base,
            "norm": round(norm, 3),
            "bar_sec": round(base * norm, 3),
            "pass": timings[q] <= base * norm,
        }
        for q, base in PERF_BARS.items()
        if q in timings
    }
    # The driver's BENCH_r{N} copy keeps only the LAST 2000 bytes of
    # stdout (BENCH_r10.json: tail len 2000, `parsed: null` four
    # rounds running because the full 206-query line is ~12 KB — its
    # HEAD, with metric/value, is what got cut). The stdout contract
    # line must therefore fit inside that window: the full payload
    # goes to BENCH_local.json, and stdout carries a compact line
    # (headline totals + as many per-query medians as fit,
    # slowest-first so the informative entries survive, plus an
    # explicit queries_omitted count and file pointer).
    # (r7-r9, `parsed: null`), so the essentials (total, sf, count,
    # per-query medians) lead the line and the bulky diagnostics
    # (rep_spread, load) trail it — a tail cut now costs only markers.
    payload = json.dumps(
        {
            "metric": "safedata-pipeline-spark headline queries, total wall sec",
            "value": total,
            "unit": "sec",
            "sf": sf,
            "n_queries": len(names),
            "queries": timings,
            # run-condition markers: per-query [min, max] over the reps
            # plus the box's 1/5/15-min load averages before and after.
            # A genuine code regression moves the MEDIAN with a tight
            # spread on an idle box; concurrent-load contention shows
            # up as wide spreads + elevated loadavg (r8's 221s-vs-257s
            # driver/builder delta was exactly this, indistinguishable
            # without the markers).
            "rep_spread": spread,
            "reps": reps,
            "canary_sec": canary_sec,
            "canary_spread": [round(_canary_reps[0], 3), round(_canary_reps[2], 3)],
            "canary_alloc_sec": canary_alloc_sec,
            "canary_alloc_spread": [round(_alloc_reps[0], 4), round(_alloc_reps[2], 4)],
            "canary_chain_sec": canary_chain_sec,
            "canary_chain_spread": [round(_chain_reps[0], 3), round(_chain_reps[2], 3)],
            "canary_sec_end": canary_sec_end,
            "canary_alloc_sec_end": canary_alloc_sec_end,
            "canary_chain_sec_end": canary_chain_sec_end,
            "perf_bars": perf_bars,
            "load": {
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                "cpus": os.cpu_count(),
                "wall_sec": round(time.time() - t_run0, 1),
            },
        }
    )
    # stdout line is the driver contract; the file copy survives any
    # stdout-tail truncation (r3's BENCH artifact lost its headline)
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_local.json"), "w") as f:
        f.write(payload + "\n")
    # compact sidecar (VERDICT r9 #9): name->median only, sorted, one
    # short line — the committed record a truncated driver copy can
    # always be reconciled against
    compact = json.dumps(
        {
            "value": total,
            "sf": sf,
            "canary_sec": canary_sec,
            "canary_alloc_sec": canary_alloc_sec,
            "canary_chain_sec": canary_chain_sec,
            "canary_sec_end": canary_sec_end,
            "canary_alloc_sec_end": canary_alloc_sec_end,
            "canary_chain_sec_end": canary_chain_sec_end,
            "perf_bars": {q: v["pass"] for q, v in perf_bars.items()},
            "n_queries": len(names),
            "q": {k: timings[k] for k in sorted(timings)},
        }
    )
    with open(os.path.join(here, "BENCH_local_compact.json"), "w") as f:
        f.write(compact + "\n")

    # stdout contract line, sized to the driver's 2000-byte tail
    # capture. Budget 1900 bytes incl. newline for safety margin.
    STDOUT_BUDGET = 1900
    base = {
        "metric": "safedata-pipeline-spark headline queries, total wall sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(names),
        "canary_sec": canary_sec,
        "canary_alloc_sec": canary_alloc_sec,
        "canary_chain_sec": canary_chain_sec,
        "canary_sec_end": canary_sec_end,
        "canary_alloc_sec_end": canary_alloc_sec_end,
        "canary_chain_sec_end": canary_chain_sec_end,
        "perf_bars": {q: v["pass"] for q, v in perf_bars.items()},
        "queries": {},
        "queries_omitted": len(names),
        "queries_full": "BENCH_local.json",
        "reps": reps,
        "wall_sec": round(time.time() - t_run0, 1),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    # slowest-first: the entries that dominate `value` survive the cut
    by_cost = sorted(timings, key=lambda k: -timings[k])
    line = json.dumps(base)
    for name in by_cost:
        base["queries"][name] = timings[name]
        base["queries_omitted"] = len(names) - len(base["queries"])
        cand = json.dumps(base)
        if len(cand) + 1 > STDOUT_BUDGET:
            del base["queries"][name]
            base["queries_omitted"] = len(names) - len(base["queries"])
            break
        line = cand
    print(line)


if __name__ == "__main__":
    main()
