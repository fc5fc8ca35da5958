"""Per-query benchmark, ONE FRESH SESSION PER QUERY (round 14).

bench_isolated.py measures queries sequentially in a single quiet
session; round 14 found that on a slow host the block-manager state a
query inherits from its predecessors (eager localCheckpoint blocks,
persisted relations) can inflate its reading 10-30x (q_pipeline: 44.7 s
in-sequence vs 1.4 s in a fresh session, identical code).  This tool
runs each named query in its OWN subprocess session — warmup (q_filter),
cold, warm — so the number is the query's and nobody else's.

Usage:
    python tools/bench_solo.py q_a q_b ...
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_solo.py q_a
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from fossa_spark.queries import all_queries
from fossa_spark.session import get_spark

name = {name!r}
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(app_name="fossa_bench_solo", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus)
queries = all_queries()

def run(n):
    t0 = time.perf_counter()
    queries[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

run("q_filter")  # session warmup: JVM, codegen path, parquet footers
cold = run(name)
warm = run(name)
print("SOLO_RESULT " + json.dumps(
    {{"q": name, "cold": round(cold, 2), "warm": round(warm, 2)}}), flush=True)
spark.stop()
"""


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: bench_solo.py q_name [q_name ...]")
    rows = []
    for name in names:
        script = _CHILD.format(repo=str(_REPO), name=name)
        proc = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True,
            cwd=str(_REPO),
        )
        rec = None
        for line in proc.stdout.splitlines():
            if line.startswith("SOLO_RESULT "):
                rec = json.loads(line[len("SOLO_RESULT "):])
        if rec is None:
            sys.stderr.write(proc.stderr[-2000:] + "\n")
            print(f"{name}: FAILED (rc={proc.returncode})", flush=True)
            continue
        rows.append((name, rec["cold"], rec["warm"]))
        print(f"{name}: cold={rec['cold']:.2f}s warm={rec['warm']:.2f}s",
              flush=True)
    if not rows:
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=_REPO,
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        commit = "unknown"
    stamp = datetime.date.today().isoformat()
    lines = [
        f"\n## {stamp} @ {commit} (sf{sf}, local[{cpus}], SOLO sessions)\n",
        "| query | cold s | warm s |",
        "|---|---|---|",
    ]
    for name, cold, warm in rows:
        lines.append(f"| {name} | {cold:.2f} | {warm:.2f} |")
    with (_REPO / "BENCHLOG.md").open("a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
