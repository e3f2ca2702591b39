#!/usr/bin/env python3
"""Time the full DuckDB oracle suite against an SF directory, uncapped.

Used for the sf1 scale proof, where the suite outgrows the in-bench
2400s subprocess cap. Reads oracle_sql.json (dumped by graft.Verify) and
prints per-query + total wall seconds as one JSON line.

  python3 tools/oracle_wall.py <oracle_sql.json> <sf_dir> [out.json]
"""
import json
import sys
import time

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> None:
    sql_path, sf_dir = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else None
    sqls = json.load(open(sql_path))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    per = {}
    t_all = time.time()
    for name in sorted(sqls):
        t0 = time.time()
        # count-wrap: the Spark leg consumes every query via .count(), so
        # the baseline must not additionally pay output-proportional row
        # materialization (fetchall of raw rows) — matches the in-bench
        # duckDbOracleWall leg (Bench.scala)
        con.execute("SELECT count(*) FROM (" + sqls[name] + ")").fetchall()
        per[name] = round(time.time() - t0, 3)
        print(f"ORACLE {name} {per[name]}s", flush=True)
    line = json.dumps({"oracle_wall_s": round(time.time() - t_all, 3),
                       "sf": sf_dir, "queries": per})
    print(line)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
