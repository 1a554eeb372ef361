#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, registers the parquet tables from
<sfDir> as DuckDB views, runs each oracle SQL, and compares against the
Spark result parquet at <verifyOutDir>/<name>/ — rows, schema (sorted
column names), and an order-insensitive value hash, like the driver.
Dev tool only (driver-side python/duckdb — not a library dependency).
"""
import json, os, sys, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def type_class(t):
    """Collapse a DuckDB type name to a canonicalization class."""
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("HUGEINT", "UHUGEINT"):
        return "int128"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    return t

def type_audit(con, sql, spark_dir):
    """The round-12 lesson, machine-enforced: an oracle column whose
    DuckDB type canonicalizes differently from its Spark twin (HUGEINT
    vs BIGINT, DECIMAL vs DOUBLE) hashes red in the driver even when
    every value is equal — and the local str()-canon replica cannot
    see it. DESCRIBE both sides and red-bar the mismatch here instead.
    Returns a list of 'col: oracleType vs sparkType' offender strings."""
    o_types = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    s_types = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchall()}
    bad = []
    for c, ot in sorted(o_types.items()):
        st = s_types.get(c)
        if st is None:
            continue  # schema check reports missing columns
        oc, sc = type_class(ot), type_class(st)
        if oc == "int128" or (oc != sc and not (oc == "int" and sc == "int")):
            bad.append(f"{c}: oracle {ot} vs spark {st}")
    return bad

def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # Environment pin: print (and persist beside the Spark artifacts) the
    # oracle engine's version, so a hash divergence seen only in another
    # environment can be diagnosed against a recorded DuckDB version
    # instead of invisible skew (the round-10 ts_mk/cluster_nmi lesson).
    env_path = os.path.join(out_dir, "verify_env.json")
    env = {}
    if os.path.exists(env_path):
        env = json.load(open(env_path))
    env["duckdb_version"] = duckdb.__version__
    json.dump(env, open(env_path, "w"), indent=1)
    print("engines: " + ", ".join(f"{k}={v}" for k, v in sorted(env.items())))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"{name}: MISSING spark output")
            n_fail += 1
            continue
        try:
            cur = con.execute(sql)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            n_fail += 1
            continue
        cur = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        s_cols = [d[0] for d in cur.description]
        s_rows = cur.fetchall()
        rows_ok = len(o_rows) == len(s_rows)
        schema_ok = sorted(o_cols) == sorted(s_cols)
        hash_ok = schema_ok and table_hash(o_rows, o_cols) == table_hash(s_rows, s_cols)
        try:
            bad_types = type_audit(con, sql, spark_dir)
        except Exception as e:
            bad_types = [f"AUDIT ERROR {e}"]
        if rows_ok and schema_ok and hash_ok and not bad_types:
            n_pass += 1
            print(f"{name}: PASS ({len(s_rows)} rows)")
        else:
            n_fail += 1
            print(f"{name}: FAIL rows={len(s_rows)}/{len(o_rows)} "
                  f"schema={schema_ok} hash={hash_ok} "
                  f"types={bad_types if bad_types else 'ok'} "
                  f"cols spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
