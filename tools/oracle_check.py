"""Local simulation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares
against ``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted,
floats rounded to 9 significant-ish digits before hashing).

Usage: python tools/oracle_check.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def norm_cell(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.9g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return hashlib.md5(bytes(v)).hexdigest()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: oracle_check.py [sf_dir] [--json LEDGER_PATH] [query ...]",
                  file=sys.stderr)
            return 2
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:]) or None

    import __spark_entry__ as entrymod
    from mds_provider_spark.session import get_spark

    spark = get_spark("oracle-check", parallelism=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # testdata tables are single files; Spark-written ones (e.g. the
        # derived .scale/sf1 set) are directories of part files
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    ledger: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        spark_s = time.monotonic() - t0
        if name not in oracles:
            print(f"ROWS-ONLY  {name:32s} rows={len(rows):7d}  ({spark_s:5.1f}s)")
            ledger[name] = {"rows_only": True, "spark_rows": len(rows),
                            "spark_sec": round(spark_s, 3)}
            continue
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        ok_cols = sorted(cols) == sorted(ocols)
        ok_count = len(rows) == len(orows)
        ok_hash = value_hash(cols, rows) == value_hash(ocols, orows)
        status = "OK " if (ok_cols and ok_count and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        ledger[name] = {
            "rows_match": ok_count, "schema_match": ok_cols,
            "hash_match": ok_hash, "spark_rows": len(rows),
            "oracle_rows": len(orows), "spark_sec": round(spark_s, 3),
        }
        print(
            f"{status}       {name:32s} rows={len(rows):7d}/{len(orows):<7d} "
            f"cols={'Y' if ok_cols else 'N'} hash={'Y' if ok_hash else 'N'} ({spark_s:5.1f}s)"
        )
        if not ok_cols:
            print(f"           spark cols: {sorted(cols)}")
            print(f"           duck  cols: {sorted(ocols)}")
        if ok_cols and ok_count and not ok_hash and rows:
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            s_l = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
            o_ord = sorted(range(len(ocols)), key=lambda i: ocols[i])
            o_l = sorted("|".join(norm_cell(r[i]) for i in o_ord) for r in orows)
            diffs = [(a, b) for a, b in zip(s_l, o_l) if a != b][:3]
            for a, b in diffs:
                print(f"           spark: {a[:160]}")
                print(f"           duck : {b[:160]}")
    spark.stop()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "failures": failures,
                       "queries": ledger}, f, indent=1)
        print("ledger:", json_out)
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
