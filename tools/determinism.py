#!/usr/bin/env python3
"""Diff two graft.Verify output directories produced from the SAME
input: every query's order-insensitive value hash must match
run-to-run. Partial-aggregation order bugs (float sums over shuffled
partitions) show up here before they show up against the oracle.
Dev tool only.

Usage: python3 tools/determinism.py <outDirA> <outDirB>
"""
import sys, os, hashlib
import duckdb


def table_hash(con, path):
    cur = con.execute(f"SELECT * FROM read_parquet('{path}/*.parquet')")
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if v != v else repr(v)
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, list):
            return "[" + ",".join(canon(x) for x in v) + "]"
        return str(v)

    lines = sorted("|".join(canon(r[i]) for i in order) for r in cur.fetchall())
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    a, b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    names = sorted(
        d for d in os.listdir(a)
        if os.path.isdir(os.path.join(a, d)) and os.path.isdir(os.path.join(b, d)))
    mismatches = [n for n in names
                  if table_hash(con, os.path.join(a, n)) != table_hash(con, os.path.join(b, n))]
    print(f"determinism: queries: {len(names)} mismatches: {mismatches}")
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
