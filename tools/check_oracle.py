#!/usr/bin/env python3
"""Self-check replicating the driver's correctness gate: run each oracle SQL
in DuckDB over the same testdata parquet and diff against graft.Verify's
dumped parquet (columns sorted by name, rows sorted, values compared).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            failed.append((name, "no spark output"))
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            failed.append((name, f"oracle sql error: {e}"))
            continue
        act = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        ecols, acols = sorted(exp.columns), sorted(act.columns)
        if ecols != acols:
            failed.append((name, f"schema mismatch: oracle={ecols} spark={acols}"))
            continue
        e = [tuple(norm(v) for v in r) for r in exp[ecols].itertuples(index=False)]
        a = [tuple(norm(v) for v in r) for r in act[acols].itertuples(index=False)]
        if sorted(map(repr, e)) != sorted(map(repr, a)):
            diff_e = [x for x in map(repr, e) if x not in set(map(repr, a))][:3]
            diff_a = [x for x in map(repr, a) if x not in set(map(repr, e))][:3]
            failed.append((name, f"rows differ: n_oracle={len(e)} n_spark={len(a)} "
                                 f"oracle_only={diff_e} spark_only={diff_a}"))
        else:
            print(f"OK   {name}  ({len(e)} rows)")
    for name, why in failed:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} oracle queries match")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
