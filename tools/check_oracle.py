"""Local replica of the driver's correctness gate: run each
__spark_entry__ query on Spark AND its oracle SQL on DuckDB at a given
sf, compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c] if not isinstance(r, tuple) else r[sorted(cols).index(c)]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from datasketches_rust_spark.session import make_local_session

    spark = make_local_session(8, shuffle_partitions=16, app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:32s} rows-only: {len(srows)} rows, cols={scols}")
            continue
        ddf = con.execute(oracles[name]).fetch_arrow_table()
        dcols = ddf.column_names
        drows = ddf.to_pylist()
        status = []
        if len(srows) != len(drows):
            status.append(f"ROWCOUNT {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            status.append(f"SCHEMA {sorted(scols)} vs {sorted(dcols)}")
        if not status:
            s_n = normalize([r.asDict() for r in srows], scols)
            d_n = normalize(drows, dcols)
            if s_n != d_n:
                diffs = [i for i, (a, b) in enumerate(zip(s_n, d_n)) if a != b]
                status.append(f"VALUES differ at {len(diffs)} rows, first: "
                              f"{s_n[diffs[0]]} vs {d_n[diffs[0]]}" if diffs else "VALUES length mismatch")
        if status:
            failures += 1
            print(f"{name:32s} FAIL: {'; '.join(status)}")
        else:
            print(f"{name:32s} OK ({len(srows)} rows)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
