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


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on sep at bracket depth 0 only (<>, ()) — nested map/struct
    type strings carry commas inside their brackets."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def canon_spark_type(t: str) -> str:
    """Spark dtype string -> engine-neutral canonical type.  The round
    driver's value hash is TYPE-aware (round-3: corpus_select failed on
    HUGEINT/INT drift with bit-identical values), so selfcheck must
    compare dtypes too — strictly, with NO widening allowance."""
    t = t.lower().strip()
    if t.startswith("array<") and t.endswith(">"):
        return f"list<{canon_spark_type(t[6:-1])}>"
    if t.startswith("map<") and t.endswith(">"):
        k, v = _split_top(t[4:-1])
        return f"map<{canon_spark_type(k)},{canon_spark_type(v)}>"
    if t.startswith("struct<") and t.endswith(">"):
        fields = []
        for f in _split_top(t[7:-1]):
            name, _, ft = f.partition(":")
            fields.append(f"{name.strip()}:{canon_spark_type(ft)}")
        return "struct<" + ",".join(fields) + ">"
    if t.startswith("decimal"):
        return "dec"
    return {
        "tinyint": "i8", "smallint": "i16", "int": "i32",
        "integer": "i32", "bigint": "i64", "float": "f32",
        "double": "f64", "string": "str", "boolean": "bool",
        "date": "date", "timestamp": "ts", "timestamp_ntz": "ts",
        "binary": "bytes",
    }.get(t, t)


def canon_duck_type(t) -> str:
    """DuckDB result type -> the same canonical space.  HUGEINT maps to
    i128 (NOT i64) on purpose: an oracle emitting it must CAST."""
    t = str(t).lower().strip()
    if t.endswith("[]"):
        return f"list<{canon_duck_type(t[:-2])}>"
    if t.startswith("map(") and t.endswith(")"):
        k, v = _split_top(t[4:-1])
        return f"map<{canon_duck_type(k)},{canon_duck_type(v)}>"
    if t.startswith("struct(") and t.endswith(")"):
        fields = []
        for f in _split_top(t[7:-1]):
            name, _, ft = f.strip().partition(" ")
            fields.append(
                f"{name.strip().strip(chr(34))}:{canon_duck_type(ft)}"
            )
        return "struct<" + ",".join(fields) + ">"
    if t.startswith("decimal"):
        return "dec"
    return {
        "tinyint": "i8", "smallint": "i16", "integer": "i32",
        "int": "i32", "bigint": "i64", "hugeint": "i128",
        "float": "f32", "real": "f32", "double": "f64",
        "varchar": "str", "boolean": "bool", "date": "date",
        "timestamp": "ts", "timestamp with time zone": "ts",
        "blob": "bytes",
    }.get(t, t)


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
        stypes = {c: canon_spark_type(t) for c, t in sdf.dtypes}
        otypes = {c: canon_duck_type(t) for c, t in zip(ocols, ores.types)}
        dtype_diffs = {
            c: (stypes[c], otypes[c])
            for c in stypes if c in otypes and stypes[c] != otypes[c]
        }
        ok_dtype = not dtype_diffs
        sc = canon([tuple(r) for r in srows], scols)
        oc = canon(orows, ocols)
        ok_vals = sc == oc
        status = ("OK" if (ok_schema and ok_count and ok_vals and ok_dtype)
                  else "FAIL")
        if status == "FAIL":
            failures.append(name)
        print(
            f"[{name}] {status} rows={len(srows)}/{len(orows)} "
            f"schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"dtypes={'ok' if ok_dtype else dtype_diffs} "
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
