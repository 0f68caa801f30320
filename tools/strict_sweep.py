"""Driver-grade correctness sweep: every registry query vs its DuckDB
oracle under the driver's EXACT comparison semantics — string-form
equality of the sorted-column frame (no numeric tolerance, no dtype
forgiveness).

This is deliberately stricter than tests/oracle_utils.assert_frames_match
(which coerces floats before comparing): a DECIMAL-typed Spark column
string-prints "0.125000" where DuckDB's DOUBLE prints "0.125" — equal
numerically, fatal to the driver's value hash. This sweep caught exactly
that class of bug in dedup_minhash_md5_audit; run it before shipping any
round.

Usage:
    python tools/strict_sweep.py [sf_dir]     # default /root/testdata/sf0.01
Exit code 1 on any failure; prints one line per failure and a summary.
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, "/root/repo")

    import duckdb
    from pyspark.sql import SparkSession

    # vanilla session on purpose: the engine must self-configure exactly
    # as it does under the external driver. Driver heap is the ONE knob
    # set here: Spark's 1g default is a laptop default, not a harness
    # property — at sf0.1 the heavyweight md5/recall audits OOM a 1g
    # single-JVM local[32] heap (driver+executors share it in local
    # mode). The external driver runs correctness at sf0.01, where the
    # sweep is green even on the 1g default.
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    queries, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    from weather_tools_spark.catalog import TABLES

    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    t0 = time.time()
    failures: list[tuple[str, str]] = []
    for name, fn in queries.items():
        try:
            sdf = fn(spark, sf).toPandas()
            if name not in oracles:
                if len(sdf.columns) == 0:
                    failures.append((name, "rows-only query returned no columns"))
                continue
            odf = con.execute(oracles[name]).df()
            s = sdf[sorted(sdf.columns)].astype(str).reset_index(drop=True)
            o = odf[sorted(odf.columns)].astype(str).reset_index(drop=True)
            if not s.equals(o):
                detail = f"rows {len(s)} vs {len(o)}"
                if len(s) == len(o) and list(s.columns) == list(o.columns):
                    neq = (s != o).any(axis=1)
                    detail += f"; {int(neq.sum())} mismatched rows, first at index {int(neq.idxmax())}"
                failures.append((name, detail))
                print(f"FAIL {name}: {detail}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — report and continue the sweep
            failures.append((name, repr(exc)[:200]))
            print(f"ERROR {name}: {exc!r}"[:300], file=sys.stderr)

    dt = time.time() - t0
    print(
        f"strict sweep: {len(queries)} queries ({len(oracles)} oracle-backed) "
        f"at {sf} in {dt:.1f}s — {len(failures)} failure(s)"
        + (": " + ", ".join(n for n, _ in failures) if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
