#!/usr/bin/env python3
"""Local replay of the driver's DuckDB-oracle correctness check.

Usage: oracle_check.py <verify_out_dir> <sf_dir> [<json_out>]

Reads <verify_out_dir>/oracle_sql.json + the per-query parquet dumps
written by graft.Verify, runs each oracle SQL in DuckDB with the sf
parquet tables registered as views, and compares (rows sorted by all
columns, column names sorted, values stringified with repr).

With <json_out>, also writes a driver-format correctness JSON
({name: {rows_match, schema_match, hash_match, err}}) so
tools/round_report.py can generate closing tables from the LOCAL gate
when the driver's round file is not yet written.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_value(r[i]) for i in idx) for r in rows]
    out.sort()
    return [cols[i] for i in idx], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = {}

    def rec(name, rows, schema, hsh, err=None):
        results[name] = {"rows_match": rows, "schema_match": schema,
                         "hash_match": hsh, "err": err}
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            rec(name, False, False, False, str(e))
            n_fail += 1
            continue
        try:
            res2 = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [d[0] for d in res2.description]
            srows = res2.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            rec(name, False, False, False, str(e))
            n_fail += 1
            continue
        # Type guard: the driver's hash is sensitive to the PANDAS dtype the
        # DuckDB result converts to, not the exact SQL type — int widths all
        # land as ints (the r12 gate passed BIGINT-vs-INTEGER rows), but
        # HUGEINT converts to float64, which is exactly how l_export_shards
        # went hash-red with cell-identical values. Flag (a) any oracle
        # column whose type leaves the integer family (HUGEINT/DECIMAL from
        # a window sum or //), and (b) cross-family mismatches between the
        # spark dump and the oracle.
        def family(t):
            t = t.upper()
            if "HUGEINT" in t or "DECIMAL" in t:
                return "float"  # pandas converts these to float64

            if any(k in t for k in ("TINYINT", "SMALLINT", "INTEGER",
                                    "BIGINT", "UINTEGER", "UBIGINT",
                                    "USMALLINT", "UTINYINT")):
                return "int"
            if any(k in t for k in ("FLOAT", "DOUBLE", "REAL")):
                return "float"
            if "BOOL" in t:
                return "bool"
            if any(k in t for k in ("TIMESTAMP", "DATE", "TIME")):
                return "temporal"
            return t  # VARCHAR, BLOB, LIST/STRUCT compare exactly
        otypes = dict(zip(con.sql(sql).columns,
                          [str(t) for t in con.sql(sql).types]))
        srel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        stypes = dict(zip(srel.columns, [str(t) for t in srel.types]))
        type_errs = []
        for c, ot in sorted(otypes.items()):
            if "HUGEINT" in ot.upper():
                type_errs.append(f"oracle col {c} is {ot} (cast it to BIGINT)")
            st = stypes.get(c)
            if st is not None and family(st) != family(ot):
                type_errs.append(f"col {c}: spark={st} oracle={ot}")
        if type_errs:
            print(f"FAIL {name}: type mismatch: {'; '.join(type_errs)}")
            rec(name, False, False, False, "; ".join(type_errs))
            n_fail += 1
            continue
        oc, orn = norm_rows(ocols, orows)
        sc, srn = norm_rows(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: schema mismatch spark={sc} oracle={oc}")
            rec(name, len(srn) == len(orn), False, False)
            n_fail += 1
        elif orn != srn:
            diffs = [(a, b) for a, b in zip(srn, orn) if a != b][:3]
            extra_s = [r for r in srn if r not in orn][:3]
            extra_o = [r for r in orn if r not in srn][:3]
            print(f"FAIL {name}: rows spark={len(srn)} oracle={len(orn)}")
            for a, b in diffs:
                print(f"   spark={a}\n  oracle={b}")
            if len(srn) != len(orn):
                print(f"   only-spark={extra_s}\n  only-oracle={extra_o}")
            rec(name, len(srn) == len(orn), True, False)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srn)} rows)")
            rec(name, True, True, True)
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {sys.argv[3]}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
