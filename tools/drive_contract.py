"""Driver-faithful contract simulator (the /verify recipe).

Loads /root/repo/__spark_entry__.py BY FILE PATH into a *vanilla*
SparkSession (local[8], shuffle.partitions=8, session TZ UTC — none of
fossa_spark.session's configs, exactly like the grading driver), smoke-runs
entry(), then for every queries() entry (or the subset named on argv) runs
the Spark query AND the oracle_sql() text on DuckDB over the same sf0.01
parquet fixtures, and compares row count + sha256 over rows sorted after
sorting columns by name.  Floats canonicalized with repr() — queries are
engineered bit-identical (integer-cents aggregation), no tolerance.

Usage:
    cd /tmp && timeout 500 python drive_contract.py [q_name ...]

Exit code 0 = zero failures.  Keep the working copy at
/tmp/drive_contract.py (the skill recipe path); this in-repo copy is the
master so each round doesn't rewrite it from the SKILL.md prose.
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import importlib.util
import sys
import time

SF_DIR = "/root/testdata/sf0.01"
ENTRY = "/root/repo/__spark_entry__.py"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "\x1f".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\x1e".join(canon_rows).encode()).hexdigest()
    return len(canon_rows), h


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .appName("drive_contract")
        .getOrCreate()
    )
    spec = importlib.util.spec_from_file_location("__spark_entry__", ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    smoke = mod.entry(spark)
    n_smoke = len(smoke.collect())
    print(f"entry() smoke: {n_smoke} rows", flush=True)

    queries = mod.queries()
    oracles = mod.oracle_sql()
    subset = sys.argv[1:]
    names = [n for n in subset if n in queries] if subset else list(queries)
    unknown = [n for n in subset if n not in queries]
    if unknown:
        print(f"UNKNOWN names skipped: {unknown}")

    failures = []
    t_all = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}", flush=True)
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(
                f"ran  {name}: {len(rows)} rows (rows-only) [{dt:.1f}s]",
                flush=True,
            )
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle error: {e}", flush=True)
            continue
        ns, hs = table_hash(cols, rows)
        no, ho = table_hash(ocols, orows)
        if sorted(cols) != sorted(ocols):
            failures.append(
                (name, f"schema mismatch: {sorted(cols)} vs {sorted(ocols)}")
            )
            print(f"FAIL {name}: schema {sorted(cols)} vs {sorted(ocols)}")
        elif ns != no:
            failures.append((name, f"rowcount {ns} vs {no}"))
            print(f"FAIL {name}: rowcount {ns} vs {no}", flush=True)
        elif hs != ho:
            failures.append((name, "hash mismatch"))
            print(f"FAIL {name}: hash mismatch ({ns} rows)", flush=True)
        else:
            print(f"ok   {name}: {ns} rows hash-match [{dt:.1f}s]", flush=True)

    dt_all = time.perf_counter() - t_all
    print(
        f"\n{len(names) - len(failures)}/{len(names)} passed "
        f"in {dt_all:.1f}s; {len(failures)} failures"
    )
    for n, why in failures:
        print(f"  FAIL {n}: {why}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
