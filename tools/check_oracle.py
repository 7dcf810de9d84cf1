"""Mimic the driver's correctness gate: run each __spark_entry__
query on Spark AND its oracle SQL on DuckDB at sf0.01, compare
row-count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [--out FILE.json] [--merge]
       [query_name ...]

``--out`` persists the sweep in the driver's CORRECTNESS schema
(name -> rows_match/schema_match/hash_match/spark_rows/oracle_rows/err)
so the full-registry mirror run is a committed artifact
(CORRECTNESS_mirror_rN.json), not CHANGELOG prose — the driver itself
only stamps the first 50 registry entries.  With ``--merge`` an
existing ``--out`` file is updated in place (named-query incremental
runs refresh their rows without discarding the rest of the sweep).
"""

from __future__ import annotations

import json
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
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    merge = "--merge" in argv
    if merge:
        argv.remove("--merge")
    names = argv or list(entrymod.queries())
    results: dict[str, dict] = {}
    if merge and out_path and os.path.exists(out_path):
        with open(out_path) as fh:
            results.update(json.load(fh))
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
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        results[name] = rec
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            rec["err"] = f"spark error: {e}"[:500]
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        rec["spark_rows"] = len(srows)
        if name not in oracles:
            rec["err"] = "rows-only (no oracle)"
            print(f"ROWS-ONLY {name}: {len(srows)} rows, cols={scols}")
            n_rowsonly += 1
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            rec["err"] = f"duckdb error: {e}"[:500]
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        rec["oracle_rows"] = len(orows)

        ok = True
        rec["rows_match"] = len(srows) == len(orows)
        if not rec["rows_match"]:
            print(f"FAIL {name}: row count spark={len(srows)} duck={len(orows)}")
            ok = False
        rec["schema_match"] = sorted(scols) == sorted(ocols)
        if not rec["schema_match"]:
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
            rec["hash_match"] = sset == oset
            if not rec["hash_match"]:
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
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=2)
        print(f"wrote {out_path} ({len(results)} entries)")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(run())
