#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Loads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, sorts
columns by name + rows by all columns, and diffs values AND TYPES.

TYPE-STRICT: the driver's hash is type-sensitive (a DuckDB HUGEINT that
materializes as decimal128(38,0) hash-mismatches a Spark int64 even when
every value is identical — the exact r6 q100/q182 failure class), so this
gate compares the arrow schema of both sides column-by-column and fails on
any mismatch. Benign physical-encoding differences that the driver's
value-hash does NOT see (int32 vs int64 it DOES see; large_string vs
string, timestamp tz spelling it does not) are normalized below.
"""
import json, math, os, sys
import duckdb

def norm_type(t):
    """Arrow type → comparison string, collapsing physical spellings the
    value-level hash cannot distinguish."""
    s = str(t)
    s = s.replace("large_string", "string").replace("large_binary", "binary")
    # Spark writes timestamps as instants (UTC); DuckDB reads naive.
    if s.startswith("timestamp"):
        s = "timestamp"
    # decimal PRECISION differs benignly (Spark sum(decimal(18,2)) →
    # decimal(28,2), DuckDB → decimal(38,2)); r6 proved the driver's hash
    # ignores it. SCALE and decimal-vs-int are kept — those DO hash-differ.
    if s.startswith("decimal"):
        scale = s[s.index("(") + 1:-1].split(",")[1].strip()
        s = f"decimal(*,{scale})"
    if s.startswith("list<") or s.startswith("large_list<"):
        inner = s[s.index("<") + 1:-1]
        # strip the item field name ("item: int64" / "l: int64")
        if ": " in inner:
            inner = inner.split(": ", 1)[1]
        s = f"list<{norm_type(inner)}>"
    return s

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

def typed_cols(arrow_table):
    """Sorted-by-name [(col, normalized type)] for an arrow table."""
    return sorted((f.name, norm_type(f.type)) for f in arrow_table.schema)

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
            gt = con.execute(f"SELECT * FROM '{spath}/*.parquet'").arrow()
            wt = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gtc, wtc = typed_cols(gt), typed_cols(wt)
        gcols = [f.name for f in gt.schema]
        wcols = [f.name for f in wt.schema]
        grows = [tuple(r.values()) for r in gt.to_pylist()]
        wrows = [tuple(r.values()) for r in wt.to_pylist()]
        gc, gr = canon(grows, gcols)
        wc, wr = canon(wrows, wcols)
        if gc != wc:
            print(f"FAIL {name}: cols spark={gc} oracle={wc}"); n_fail += 1
        elif gtc != wtc:
            bad = [(a, b) for a, b in zip(gtc, wtc) if a != b]
            print(f"FAIL {name}: TYPE diff (spark, oracle): {bad}")
            n_fail += 1
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
