"""Local mimic of the driver's t2 correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` twin on the
same parquet tables and compares row count, sorted column names, and an
order-insensitive value comparison. Usage:

    python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return repr(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.session import (
        get_spark,
    )

    spark = get_spark("verify_oracle")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle ({len(srows)} rows, rows-only check)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failed.append(name)
            continue
        dt = time.time() - t0
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        # dtype parity (spark simpleString → duckdb type name)
        type_map = {
            "boolean": "BOOLEAN",
            "int": "INTEGER",
            "bigint": "BIGINT",
            "double": "DOUBLE",
            "string": "VARCHAR",
            "timestamp": "TIMESTAMP",
            "date": "DATE",
            "array<double>": "DOUBLE[]",
            "array<bigint>": "BIGINT[]",
            "array<string>": "VARCHAR[]",
        }
        sdt = dict(sdf.dtypes)
        try:
            odt = {
                r[0]: r[1]
                for r in con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            }
            for col, st in sdt.items():
                if col in odt and str(odt[col]) != type_map.get(st, st):
                    problems.append(
                        f"dtype {col}: spark={st} duckdb={odt[col]}"
                    )
        except Exception:
            pass
        if not problems:
            sn = norm_rows(scols, [tuple(r) for r in srows])
            on = norm_rows(ocols, orows)
            if sn != on:
                ndiff = sum(1 for a, b in zip(sn, on) if a != b)
                problems.append(f"values differ ({ndiff} of {len(sn)} rows)")
                for a, b in list(zip(sn, on))[:2000]:
                    if a != b:
                        problems.append(f"  spark : {a}")
                        problems.append(f"  oracle: {b}")
                        break
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            failed.append(name)
        else:
            print(f"PASS  {name} ({dt:.1f}s, {len(srows)} rows)")
    print()
    if failed:
        print(f"{len(failed)} FAILED: {failed}")
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
