#!/usr/bin/env python3
"""Comparator-fragility sweep over Verify's Spark output schemas.

Usage: python3 tools/typesweep.py <verifyOutDir>

The driver's correctness gate hashes values type-sensitively, and r6/r7
proved some final-column types diverge between DuckDB versions even when
every value is bit-identical locally (the q182 DECIMAL(38,2) class). This
sweep FAILS on any final output column whose type is in a known-fragile
class, so the whole suite stays inside the house idiom (BIGINT cents /
floor-rounded DOUBLE / STRING / DATE):

  * decimal with precision > 18 — DuckDB's sum(DECIMAL) result width and
    its decimal hashing are version-skewed; 18 digits is the int64-safe
    bound both engines agree on.
  * any nested decimal inside list/struct/map, same bound.

Run after `graft.Verify`:  python3 tools/typesweep.py /tmp/verify_out
"""
import os, re, sys
import duckdb


FRAGILE = re.compile(r"decimal\s*\(\s*(\d+)\s*,\s*(-?\d+)\s*\)", re.I)


def fragile_types(type_str):
    """Return list of human-readable problems for one arrow type string."""
    out = []
    for m in FRAGILE.finditer(type_str):
        prec = int(m.group(1))
        if prec > 18:
            out.append(f"decimal({m.group(1)},{m.group(2)}) wider than 18 digits")
    return out


def main(out_dir):
    con = duckdb.connect()
    n_ok = n_bad = 0
    names = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        tbl = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0").arrow()
        probs = []
        for f in tbl.schema:
            for p in fragile_types(str(f.type)):
                probs.append(f"{f.name}: {p}")
        if probs:
            print(f"FRAGILE {name}: " + "; ".join(probs))
            n_bad += 1
        else:
            n_ok += 1
    print(f"== {n_ok} clean / {n_bad} fragile ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
