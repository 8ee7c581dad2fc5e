#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Loads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, sorts
columns by name + rows by all columns, and diffs values.
"""
import json, math, os, sys
import duckdb

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0: v = 0.0
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spath = f"{out_dir}/{name}"
        if not os.path.isdir(spath):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{spath}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            want = con.execute(sql)
            wcols = [d[0] for d in want.description]
            wrows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gc, gr = canon(grows, gcols)
        wc, wr = canon(wrows, wcols)
        if gc != wc:
            print(f"FAIL {name}: cols spark={gc} oracle={wc}"); n_fail += 1
        elif len(gr) != len(wr):
            print(f"FAIL {name}: rows spark={len(gr)} oracle={len(wr)}")
            n_fail += 1
        elif gr != wr:
            bad = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
            print(f"FAIL {name}: value diff, first: {bad}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
