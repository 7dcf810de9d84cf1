"""Mimic the driver's correctness gate: run each __spark_entry__
query on Spark AND its oracle SQL on DuckDB at sf0.01, compare
row-count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from validate_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bool):
        return bool(v)
    return v


def run():
    names = sys.argv[1:] or list(entrymod.queries())
    spark = get_spark(app="oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        fn = qs[name]
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, cols={scols}")
            n_rowsonly += 1
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue

        ok = True
        if len(srows) != len(orows):
            print(f"FAIL {name}: row count spark={len(srows)} duck={len(orows)}")
            ok = False
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={scols} duck={ocols}")
            ok = False
        if ok:
            sidx = [scols.index(c) for c in sorted(scols)]
            oidx = [ocols.index(c) for c in sorted(ocols)]
            sset = sorted(
                [tuple(norm(r[i]) for i in sidx) for r in srows], key=repr
            )
            oset = sorted(
                [tuple(norm(r[i]) for i in oidx) for r in orows], key=repr
            )
            if sset != oset:
                diff_s = [r for r in sset if r not in oset][:3]
                diff_o = [r for r in oset if r not in sset][:3]
                print(f"FAIL {name}: values differ; spark-only={diff_s} duck-only={diff_o}")
                ok = False
        if ok:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(run())
