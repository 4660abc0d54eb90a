#!/usr/bin/env python3
"""Dev-only replica of the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir
parquet tables, sorts columns by name + rows by all columns, and
compares cell-by-cell. Not shipped; uses driver-side python deps.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df())
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        # schema (dtype) parity — the driver checks schema, not just values
        sp_t = con.sql(f"SELECT * FROM '{res_dir}/*.parquet' LIMIT 0")
        du_t = con.sql(sql)
        tdiff = {c: (str(a), str(b)) for c, a, b in
                 zip(sp_t.columns, sp_t.types,
                     [dict(zip(du_t.columns, du_t.types))[c]
                      for c in sp_t.columns])
                 if str(a) != str(b)}
        if tdiff:
            print(f"FAIL {name}: dtype diff {tdiff}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        diff_cols = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                # string-render compare only: Series.equals treats
                # -0.0 == 0.0 and would mask a signed-zero divergence
                # the driver's value hash catches (the x16 lesson)
                same = (a.astype(str) == b.astype(str)).all()
            except Exception:
                same = False
            if not same:
                diff_cols.append(c)
        if diff_cols:
            print(f"FAIL {name}: value diff in {diff_cols}")
            for c in diff_cols[:2]:
                neq = got[c].astype(str) != want[c].astype(str)
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"   row {i} col {c}: spark={got[c][i]!r} duck={want[c][i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
