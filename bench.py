"""Benchmark harness: runs the full declared query inventory at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (one JSON object per line):
  - {"detail_cold": {q: sec, ...}}                 cold per-query map
  - {"detail_warm_part": i, "queries": {...}}      warm map, 60-query chunks
  - {"detail_norm_part": i, "queries": {...}}      warm map in CALIB UNITS
    (per-query warm seconds divided by the nearest interleaved
    calibration probe — host-independent; round 12, VERDICT r11 item 5:
    the quiet-host convention was breached two rounds running, so the
    artifact of record now carries its own normalization)
  - FINAL line, totals only (~250 bytes — the driver tail-captures ~2 KB
    of stdout, so the last line must never carry the per-query map):
    {"metric", "value", "unit", "cold_total", "warm_total", "n_queries",
     "warm_mean", "calib_s", "calib_probes", "calib_drift",
     "warm_total_norm", "warm_mean_norm", "sf"}

Each query is forced end-to-end with the noop sink (full computation, no
driver-side collect — what a cluster run would do). JVM/codegen warmup is a
single throwaway run of the flagship query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from fossa_spark.queries import all_queries  # noqa: E402
from fossa_spark.session import get_spark  # noqa: E402


def main() -> None:
    # Round 15 (VERDICT r14 item 1): the stage cache is per-process now
    # (fossa_spark.sources._default_cache_root) so nothing precomputed
    # survives across bench runs; wipe any repo-level .stage_cache/ left
    # by an older checkout so the timed run provably starts cold.
    import shutil

    shutil.rmtree(os.path.join(_REPO, ".stage_cache"), ignore_errors=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="fossa_spark_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    queries = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("q_agg_basic")  # warmup: JVM, codegen, parquet footer cache

    # HOST CALIBRATION (VERDICT r5 item 5): a fixed, fixture-independent
    # codegen-only aggregate (10^7-row range → hash agg), run 3x after
    # warmup, median reported as calib_s on the contract line.  Rounds
    # 4→5 needed prose ("host ~25-30% slower this round") to explain
    # regressions on untouched code; BENCH_rN/BENCH_rM totals are now
    # mechanically comparable via (warm_total / calib_s) ratios.
    def _calib_once() -> float:
        t0 = time.perf_counter()
        spark.range(10_000_000).selectExpr(
            "id % 97 AS k", "xxhash64(id) % 1000003 AS v"
        ).groupBy("k").agg({"v": "sum"}).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    def _block_reset() -> None:
        """Drop accumulated JVM state at each calibration boundary
        (round 13, VERDICT r12 item 1): the interleaved probes of round
        12 normalized for host SPEED but not for in-suite STATE —
        localCheckpoint()ed relations and df.persist() blocks from ~250
        predecessor queries accumulate in the block manager, slowing
        real queries while the codegen-only probe stays fast, so the
        alphabetically-late tail read 2-6x its isolated cost
        (q_view_maintain 8.41 calib-units in-suite vs 2.33 s isolated).
        clearCache() empties the SQL CacheManager; the persistent-RDD
        sweep catches localCheckpoint blocks (not CacheManager-tracked);
        the GC pair lets the ContextCleaner reap unreferenced broadcast
        state.  Everything swept is per-query-internal — cross-query
        staging is parquet-on-disk (stage_files) and unaffected."""
        spark.catalog.clearCache()
        sc = spark.sparkContext
        it = sc._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)
        import gc

        gc.collect()  # drop py4j refs first so JVM GC can collect them
        sc._jvm.System.gc()

    def _query_reset() -> None:
        """Light per-QUERY sweep (round 14): clearCache + persistent-RDD
        unpersist only, no GC pair.  The r13 _block_reset bounded state
        pollution to a 30-query block, but round 14 measured the
        within-block residue still inflating mid-block queries 3-30x on
        a slow host (q_pipeline 44.7 s after 7 polluted predecessors vs
        1.4 s in a fresh session — identical code; q_bpe_train 56 vs
        5.3 s): every eager localCheckpoint an iterative operator takes
        leaves its blocks in the block manager until *some* reset drops
        them, and the memory-store pressure + GC churn is charged to
        whatever query runs next.  Sweeping after every query keeps each
        timing the query's own.  The sweep is control-plane work (~ms);
        the expensive System.gc pair stays at calibration boundaries.
        Methodology is otherwise unchanged (cold+warm noop, interleaved
        calib probes) — see OPTIMIZATION_r14.md."""
        spark.catalog.clearCache()
        sc = spark.sparkContext
        it = sc._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)

    calib_runs = sorted(_calib_once() for _ in range(3))
    calib_s = round(calib_runs[1], 4)

    # cold = first run (codegen + plan compile + execute); warm = second run
    # (execute only). Warm is the round-over-round comparable number — cold
    # is dominated by per-plan codegen noise at this tiny per-query scale.
    #
    # INTERLEAVED calibration (round 12): one probe before every
    # _CALIB_EVERY-query block of the warm pass (plus one after the last
    # block), so each query gets a LOCAL host-speed reading taken within
    # seconds of its own run — the startup-only calib of rounds 5-11
    # couldn't see mid-run host drift (BENCH_r10/r11 were recorded on
    # hosts that slowed ~20% while the sweep ran).  norm[q] = warm[q] /
    # mean(block probe, next probe) is in CALIB UNITS (dimensionless
    # multiples of the fixed 10^7-row aggregate) and comparable across
    # rounds regardless of host.
    _CALIB_EVERY = 30
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    probes: list[float] = []
    names = sorted(queries)
    block_of: dict[str, int] = {}
    for i, name in enumerate(names):
        if i % _CALIB_EVERY == 0:
            _block_reset()
            probes.append(_calib_once())
        block_of[name] = len(probes) - 1
        timings[name] = round(run(name), 4)
        warm[name] = round(run(name), 4)
        _query_reset()  # drop this query's blocks before the next one runs
    _block_reset()
    probes.append(_calib_once())  # closing probe bounds the last block
    norm = {
        n: round(2.0 * warm[n] / (probes[b] + probes[b + 1]), 4)
        for n, b in block_of.items()
    }

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # The driver captures only ~2 KB of stdout TAIL; r02 AND r03 both ended
    # parsed:null because the final line carried the full per-query map
    # (~5 KB) and got beheaded.  Contract (VERDICT r03 item 2): per-query
    # detail goes on EARLIER lines; the FINAL line is totals only (~150 B)
    # so it always survives the tail capture.  The warm per-query map is
    # split across several lines so at least the tail-most chunks survive
    # too (alphabetically-late queries were the only ones visible in r03).
    # Also WRITE the full per-query map to a file (VERDICT r13 item 7):
    # the driver's stdout tail keeps only the last ~80 numbers, which
    # limited r13's regression triage to a 36-query overlap.  The file
    # survives whole, so round-over-round diffs can cover every query.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_DETAIL.json"),
            "w",
        ) as fh:
            json.dump(
                {
                    "sf": sf,
                    "calib_probes": [round(p, 4) for p in probes],
                    "cold": timings,
                    "warm": warm,
                    "norm": norm,
                },
                fh,
                separators=(",", ":"),
                sort_keys=True,
            )
    except OSError:
        pass  # a read-only checkout must not kill the bench run
    print(json.dumps({"detail_cold": timings}, separators=(",", ":")))
    warm_items = sorted(warm.items())
    for i in range(0, len(warm_items), 60):
        chunk = dict(warm_items[i : i + 60])
        print(
            json.dumps(
                {"detail_warm_part": i // 60, "queries": chunk},
                separators=(",", ":"),
            )
        )
    norm_items = sorted(norm.items())
    for i in range(0, len(norm_items), 60):
        chunk = dict(norm_items[i : i + 60])
        print(
            json.dumps(
                {"detail_norm_part": i // 60, "queries": chunk},
                separators=(",", ":"),
            )
        )
    print(
        json.dumps(
            {
                "metric": "fossa_spark_total_query_time",
                "value": total,
                "unit": "sec",
                "cold_total": total,
                "warm_total": round(sum(warm.values()), 4),
                # the suite GROWS round over round — normalize before
                # comparing totals across BENCH_r{N} files
                "n_queries": len(warm),
                "warm_mean": round(sum(warm.values()) / len(warm), 4),
                "calib_s": calib_s,
                # interleaved-probe stats + normalized totals (round 12):
                # drift = max/min probe exposes within-run host swings;
                # warm_total_norm is the host-independent headline.
                "calib_probes": len(probes),
                "calib_med": round(sorted(probes)[len(probes) // 2], 4),
                "calib_drift": round(max(probes) / min(probes), 3),
                "warm_total_norm": round(sum(norm.values()), 2),
                "warm_mean_norm": round(sum(norm.values()) / len(norm), 4),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
