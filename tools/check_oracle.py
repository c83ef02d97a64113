#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads <out>/oracle_sql.json, registers every parquet in <sf_dir> as a DuckDB
view named after the table, runs each oracle SQL, and compares against the
Spark-written parquet in <out>/<name>/ by (rowcount, sorted column names,
order-independent value hash). Mirrors what CORRECTNESS_r{N}.json checks so
oracle SQL is validated BEFORE the round gate runs it.
"""
import sys, os, json, glob, hashlib
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # driver-style: repr of float; ints that are floats normalize
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.splitext(os.path.basename(p))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"[MISS] {name}: no spark output dir")
            n_bad += 1
            continue
        try:
            # Type-drift guard: DuckDB SUM(int) yields HUGEINT (int128) which
            # the DRIVER's canonicalization (pandas path: HUGEINT -> float64)
            # renders differently from Spark BIGINT even though this tool's
            # fetchall() path sees identical python ints. Flag any such column
            # as a failure so the local gate agrees with the driver gate.
            drift = [(c, t) for c, t, *_ in
                     con.execute(f"DESCRIBE {sql}").fetchall()
                     if t in ("HUGEINT", "UHUGEINT", "UBIGINT")]
            if drift:
                print(f"[FAIL] {name}: oracle type drift (driver-incompatible): {drift}"
                      f" — CAST to BIGINT/DOUBLE in the oracle SQL")
                n_bad += 1
                continue
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"[ERR ] {name}: duckdb failed: {e}")
            n_bad += 1
            continue
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            scols = [d[0] for d in sp.description]
            srows = sp.fetchall()
        except Exception as e:
            print(f"[ERR ] {name}: spark parquet read failed: {e}")
            n_bad += 1
            continue
        ok_schema = sorted(dcols) == sorted(scols)
        ok_rows = len(drows) == len(srows)
        ok_hash = ok_schema and table_hash(drows, dcols) == table_hash(srows, scols)
        if ok_schema and ok_rows and ok_hash:
            print(f"[ OK ] {name}: rows={len(srows)}")
            n_ok += 1
        else:
            print(f"[FAIL] {name}: schema_ok={ok_schema} rows {len(srows)} vs {len(drows)} hash_ok={ok_hash}")
            if not ok_schema:
                print(f"        spark cols: {sorted(scols)}")
                print(f"        duck  cols: {sorted(dcols)}")
            else:
                # show first differing line for debugging
                order = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dl = sorted("\x1f".join(canon(r[i]) for i in order) for r in drows)
                sl = sorted("\x1f".join(canon(r[i]) for i in order) for r in srows)
                for a, b in zip(sl, dl):
                    if a != b:
                        print(f"        spark: {a[:200]}")
                        print(f"        duck : {b[:200]}")
                        break
                if len(sl) != len(dl):
                    print(f"        (row count differs)")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
