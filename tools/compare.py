#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
sfDir parquet tables registered as views, and compares against the
Spark-written parquet in <verifyOutDir>/<name>/. Columns sorted by name,
rows sorted by all columns; floats compared with 1e-6 relative tolerance
(and exact-match reported separately, since the driver may hash exactly).

Dev tool only — not part of the Scala library.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(str(v) if not isinstance(v, float) else v for v in r))

    # sort key: strings as-is, floats QUANTIZED — sorting on raw float repr
    # can order two within-tolerance result sets differently (low-order bit
    # noise), mispairing rows and reporting a spurious FAIL. Quantization is
    # RELATIVE (6 significant digits, matching close()'s rel_tol) — an
    # absolute round(x, 6) would still mispair values of magnitude >> 1.
    def key(t):
        return tuple(("f", "%.6g" % x) if isinstance(x, float) else ("s", x)
                     for x in t)

    return sorted(out, key=key)


def kind(t):
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
             "INT", "INT32", "INT64", "LONG", "SHORT", "BYTE"):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t == "HUGEINT":
        return "hugeint"   # pandas float64 — hash-breaks vs int64
    if t.startswith("DECIMAL"):
        return "decimal"   # pandas object(Decimal) — hash-breaks vs float64
    return "other"


def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-9)
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            o = con.sql(sql)
            ocols = sorted(o.columns)
            orows = con.sql(
                f"SELECT {', '.join(ocols)} FROM o").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            s = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = sorted(s.columns)
            srows = con.sql(
                f"SELECT {', '.join(scols)} FROM s").fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        if ocols != scols:
            print(f"FAIL {name}: columns differ: oracle={ocols} spark={scols}")
            n_bad += 1
            continue
        # Driver hash parity: the driver hashes pandas values, so a DuckDB
        # HUGEINT/DECIMAL column (pandas float64/object) vs a Spark BIGINT
        # (int64) hash-mismatches even when every value is equal. DuckDB's
        # sum(BIGINT) returns HUGEINT — oracle SQL must CAST it back.
        okinds = dict(zip(o.columns, (kind(str(t)) for t in o.types)))
        skinds = dict(zip(s.columns, (kind(str(t)) for t in s.types)))
        kind_bad = [(c, okinds[c], skinds[c]) for c in ocols
                    if okinds[c] != skinds[c]]
        if kind_bad:
            c, ok_, sk_ = kind_bad[0]
            print(f"FAIL {name}: dtype kind differs (driver hash mismatch): "
                  f"col {c}: oracle={ok_} spark={sk_}")
            n_bad += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rowcount oracle={len(orows)} spark={len(srows)}")
            n_bad += 1
            continue
        on, sn = norm(orows), norm(srows)
        exact = on == sn
        bad = None
        for i, (orow, srow) in enumerate(zip(on, sn)):
            for j, (a, b) in enumerate(zip(orow, srow)):
                if not close(a, b):
                    bad = (i, ocols[j], a, b)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: oracle={bad[2]!r} spark={bad[3]!r}")
            n_bad += 1
        else:
            tag = "exact" if exact else "tol"
            print(f"ok   {name} ({len(srows)} rows, {tag})")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
