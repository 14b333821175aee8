"""Driver-style correctness harness: run each __spark_entry__ query on Spark
and its DuckDB oracle at sf0.01, compare row count, schema (column names),
and order-insensitive values.  Mirrors what the round driver records in
CORRECTNESS_r{N}.json so mismatches surface before the round gate."""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            v = 0.0  # DuckDB round() keeps -0.0; Spark's doesn't
        return f"{v:.6f}"
    if v is None:
        return "null"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.6f}"
    except Exception:
        pass
    return str(v)


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = sorted(
        tuple(norm_val(r[i]) for i in order) for r in rows
    )
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None

    import __spark_entry__ as entrymod
    from crankshaft_spark import get_session

    spark = get_session(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # a misspelled filter name must fail loudly: silently matching
    # nothing would print 'FAILURES: none' and exit 0 — a false pass of
    # the parity gate
    unknown = set(only or []) - set(qs)
    if unknown:
        raise SystemExit(
            f"unknown query name(s): {sorted(unknown)} — "
            f"valid: {sorted(qs)}")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            failures.append(name)
            print(f"[{name}] SPARK ERROR: {e}")
            continue
        if name not in oracles:
            print(f"[{name}] rows={len(srows)} (rows-only check) "
                  f"{time.time()-t0:.1f}s")
            if len(srows) == 0:
                failures.append(name)
            continue
        try:
            ores = con.sql(oracles[name])
            ocols = ores.columns
            orows = ores.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"[{name}] ORACLE ERROR: {e}")
            continue
        ok_schema = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        sc = canon([tuple(r) for r in srows], scols)
        oc = canon(orows, ocols)
        ok_vals = sc == oc
        status = "OK" if (ok_schema and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"[{name}] {status} rows={len(srows)}/{len(orows)} "
            f"schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"values={'ok' if ok_vals else 'MISMATCH'} {time.time()-t0:.1f}s"
        )
        if not ok_vals and ok_count:
            for a, b in zip(sc, oc):
                if a != b:
                    print(f"    spark : {a}\n    oracle: {b}")
                    break
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
