"""Replicates the grading driver's correctness sweep locally.

Runs every ``queries()`` entry against its ``oracle_sql()`` twin at
sf0.01 (the driver's scale), comparing row count, column names, and
sorted-by-column-name value tuples — the same comparison
``tests/test_oracle_parity.py`` pins at sf0.001.  Prints one summary
line per query and a final BAD list; exit code 1 if any query fails.

Usage:  python scripts/driver_sweep.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lasutility_spark.oracle_compare import rows_duck, rows_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None, help="subset of query names")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as m

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("driver_sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(args.sf_dir, t)}.parquet'"
        )

    queries = m.queries()
    oracles = m.oracle_sql()
    names = args.only if args.only else list(queries)
    bad = []
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf_dir)
            got = rows_spark(sdf)
            if name in oracles:
                res = con.sql(oracles[name])
                want = rows_duck(con, oracles[name])
                ok = (
                    len(got) == len(want)
                    and sorted(c.lower() for c in sdf.columns)
                    == sorted(c.lower() for c in res.columns)
                    and got == want
                )
                status = "OK" if ok else "MISMATCH"
            else:
                # rows-only entries (none registered today) must at least
                # produce output to count
                ok = len(got) > 0
                status = "OK(rows-only)" if ok else "EMPTY"
        except Exception as e:  # noqa: BLE001 - sweep must report, not die
            ok, status = False, f"ERROR {type(e).__name__}: {e}"
            got = []
        if not ok:
            bad.append(name)
        print(f"{name:32s} {status:12s} rows={len(got):7d} {time.time()-t0:6.1f}s", flush=True)
    print(f"total {time.time()-t_all:.0f}s")
    print("BAD:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
