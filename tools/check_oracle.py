#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>

Loads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the <sfDir>
tables, and compares as sorted row multisets (columns sorted by name,
exact value equality; floats compared bit-exactly, reporting max delta
on mismatch).
"""
import duckdb
import glob
import json
import math
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def key(row):
    return tuple(str(type(v)) + "|" + repr(v) for v in row)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.sql(sql)
            exp_cols = [c.lower() for c in exp.columns]
            exp_rows = exp.fetchall()
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            got = con.sql(f"SELECT * FROM read_parquet({files!r})")
            got_cols = [c.lower() for c in got.columns]
            got_rows = got.fetchall()
            # sort columns by name (driver behavior)
            eidx = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
            gidx = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            if sorted(exp_cols) != sorted(got_cols):
                print(f"FAIL {name}: columns differ spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
                n_fail += 1
                continue
            e = sorted([tuple(norm(r[i]) for i in eidx) for r in exp_rows], key=key)
            g = sorted([tuple(norm(r[i]) for i in gidx) for r in got_rows], key=key)
            if len(e) != len(g):
                print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
                n_fail += 1
                continue
            bad = max_d = 0
            first = None
            for re_, rg in zip(e, g):
                if re_ != rg:
                    bad += 1
                    if first is None:
                        first = (re_, rg)
                    for a, b in zip(re_, rg):
                        if isinstance(a, float) and isinstance(b, float):
                            max_d = max(max_d, abs(a - b))
            if bad:
                print(f"FAIL {name}: {bad}/{len(e)} rows differ, max_float_delta={max_d}")
                print(f"  oracle: {first[0]}\n  spark:  {first[1]}")
                n_fail += 1
            else:
                print(f"PASS {name}: {len(e)} rows")
                n_pass += 1
        except Exception as ex:
            print(f"FAIL {name}: exception {str(ex)[:300]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
