"""Isolated per-query benchmark → BENCHLOG.md.

The full-suite bench (bench.py) runs 200+ queries back-to-back; NOTES.md
documents 2-5x host-noise swings in that regime (q_pagerank: 11.2 s in a
sweep vs 4.1 s isolated), which makes per-query perf claims unreviewable
from BENCH_r{N}.json alone.  This tool measures each query ISOLATED —
one plan at a time, cold then warm in a quiet session — and appends a
dated, commit-stamped section to BENCHLOG.md so regressions are diffable
round over round (VERDICT r03 item 3).

Usage:
    python tools/bench_isolated.py                 # default top-expensive set
    python tools/bench_isolated.py q_a q_b ...     # explicit subset
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_isolated.py
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from fossa_spark.queries import all_queries  # noqa: E402
from fossa_spark.session import get_spark  # noqa: E402

# The persistently-expensive tail of the suite (every query whose warm
# full-suite time has exceeded ~1.5 s in any round), plus the flagship
# aggregate as a fast canary.  Keep sorted by expected cost desc so a
# time-boxed run loses the cheap end.
DEFAULT_QUERIES = [
    "q_dedup_setsim",
    "q_pipeline",
    "q_pagerank",
    "q_split_leakage_safe",
    "q_dedup_near",
    "q_win_corr",
    "q_sim_ivf",
    "q_dedup_semantic",
    "q_sim_pq",
    "q_bpe_train",
    "q_stream_stateful_exec",
    "q_stream_join_exec",
    "q_stream_outer_join_exec",
    "q_dedup_incremental",
    "q_stream_dedup_near",
    "q_cluster_keep",
    "q_dedup_containment",
    "q_dedup_ngram",
    "q_dedup_embed",
    "q_join_range",
    "q_split_train",
    "q_multimodal",
    "q_sql_q21",
    # round-12 additions worth tracking (decade ledger in BENCHLOG.md)
    "q_dedup_simhash",
    "q_lm_bigram",
    "q_boost_tree2",
    "q_forest_vote",
    "q_hits",
    # round-13 additions worth tracking (decade ledger in BENCHLOG.md)
    "q_dedup_span",
    "q_text_winnow",
    "q_sim_recall",
    "q_dedup_recall",
    "q_gbt_depth2",
    "q_contamination_span",
    "q_agg_basic",  # fast canary — now honestly cold (see WARMUP_QUERY)
]

# Session warmup (JVM, codegen path, parquet footers) — deliberately
# OUTSIDE the measured set: round-4 advisor caught that warming up with a
# measured query (q_agg_basic) made its logged "cold" cell a third warm
# run, systematically misleading across rounds.  q_filter touches the
# same lineitem scan + codegen machinery without appearing in any
# DEFAULT_QUERIES row.
WARMUP_QUERY = "q_filter"


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="fossa_spark_bench_isolated",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    queries = all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    if WARMUP_QUERY in names:  # explicit-subset runs may name it; keep cold honest
        raise SystemExit(f"{WARMUP_QUERY} is the warmup query; cannot measure it")
    run(WARMUP_QUERY)  # session warmup: JVM, codegen path, parquet footers
    rows = []
    for name in names:
        cold = run(name)
        warm = run(name)
        rows.append((name, cold, warm))
        print(f"{name}: cold={cold:.2f}s warm={warm:.2f}s", flush=True)
    spark.stop()

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=_REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        commit = "unknown"
    stamp = datetime.date.today().isoformat()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    lines = [
        f"\n## {stamp} @ {commit} (sf{sf}, local[{cpus}])\n",
        "| query | cold s | warm s |",
        "|---|---|---|",
    ]
    for name, cold, warm in rows:
        lines.append(f"| {name} | {cold:.2f} | {warm:.2f} |")
    log = _REPO / "BENCHLOG.md"
    if not log.exists():
        log.write_text(
            "# BENCHLOG — isolated per-query timings\n\n"
            "Appended by tools/bench_isolated.py: each query measured alone\n"
            "(cold = first run incl. codegen; warm = immediate re-run) in a\n"
            "quiet session, so numbers are comparable across rounds without\n"
            "the 2-5x full-suite host-noise documented in NOTES.md.\n"
        )
    with log.open("a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(rows)} rows to {log}")


if __name__ == "__main__":
    main()
