#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers each parquet table as a DuckDB view, runs every oracle_sql.json
entry, and compares against the Spark parquet dump: columns sorted by name,
rows sorted, values normalized (floats rounded to 9 significant-ish digits).
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.9g}")
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    # a query that failed inside Verify leaves no output dir — that must
    # FAIL the gate, not silently vanish from the report
    produced = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(set(oracles) - produced):
        print(f"[FAIL-miss] {name}: oracle declared but no Verify output dir")
        n_bad += 1
    for name in sorted(produced):
        d = os.path.join(out_dir, name)
        tbl = pq.read_table(d)
        sc, srows = canon(tbl.column_names, [list(r.values()) for r in tbl.to_pylist()])
        if name not in oracles:
            if len(srows) > 0:
                print(f"[rows-only] {name}: rows={len(srows)} OK")
            else:
                print(f"[FAIL-empty] {name}: rows-only query returned 0 rows")
                n_bad += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [c[0] for c in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"[FAIL-sql ] {name}: {e}")
            n_bad += 1
            continue
        oc, orows = canon(ocols, orows)
        if sc != oc:
            print(f"[FAIL-cols] {name}: spark={sc} oracle={oc}")
            n_bad += 1
        elif srows != orows:
            n_bad += 1
            diff_a = [r for r in srows if r not in orows][:3]
            diff_b = [r for r in orows if r not in srows][:3]
            print(f"[FAIL-rows] {name}: spark={len(srows)} oracle={len(orows)}")
            print(f"   spark-only: {diff_a}")
            print(f"   oracle-only: {diff_b}")
        else:
            n_ok += 1
            print(f"[OK       ] {name}: rows={len(srows)}")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
