#!/usr/bin/env python3
"""Driver-style oracle compare (builder tooling): reads the Spark dumps via
pyarrow/pandas — the same reader path the driver's hash uses — instead of
routing both sides through DuckDB like tools/check.py. Catches dtype/repr
divergences (e.g. DATE columns) that a DuckDB-read-both-sides compare
cannot see. Values are compared exactly; dtype differences are reported as
warnings only (the driver hashes values, not dtypes — proven by round-1
int32-vs-int64 rank columns passing).
Usage: python3 tools/check_pandas.py <sfDir> <verifyOutDir> [query...]
"""
import sys, glob, os, math, json
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        # sorted: glob order is filesystem-dependent; multi-file dumps must
        # concatenate part-00000, part-00001, ... in partition order for the
        # positional compare against the ORDER BY'd oracle to be meaningful
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"[MISS] {name}"); n_fail += 1; continue
        try:
            duck = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}"); n_fail += 1; continue
        spark = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        duck, spark = duck[sorted(duck.columns)], spark[sorted(spark.columns)]
        if list(duck.columns) != list(spark.columns) or len(duck) != len(spark):
            print(f"[FAIL] {name}: shape {list(duck.columns)}/{list(spark.columns)} "
                  f"rows {len(duck)}/{len(spark)}")
            n_fail += 1; continue
        bad = None
        for c in duck.columns:
            if str(duck[c].dtype) != str(spark[c].dtype):
                print(f"[WARN] {name}.{c}: dtype {duck[c].dtype} vs {spark[c].dtype} "
                      "(values still compared)")
            for a, b in zip(duck[c].tolist(), spark[c].tolist()):
                an = a is None or (isinstance(a, float) and math.isnan(a))
                bn = b is None or (isinstance(b, float) and math.isnan(b))
                if an and bn: continue
                if an != bn: bad = f"{c}: null {a!r} vs {b!r}"; break
                if isinstance(a, float) and isinstance(b, float):
                    if a != b: bad = f"{c}: {a!r} vs {b!r}"; break
                elif str(a) != str(b):
                    # datetime repr variance: lenient ONLY when one side is a
                    # plain date and the other a midnight timestamp of that
                    # date — not for arbitrary values sharing a prefix
                    import datetime
                    da = a.date() if isinstance(a, pd.Timestamp) and a == a.normalize() else a
                    db = b.date() if isinstance(b, pd.Timestamp) and b == b.normalize() else b
                    if (isinstance(da, datetime.date) and isinstance(db, datetime.date)
                            and da == db): continue
                    bad = f"{c}: {a!r} vs {b!r}"; break
            if bad: break
        if bad:
            print(f"[FAIL] {name}: {bad}"); n_fail += 1
        else:
            print(f"[PASS] {name} ({len(duck)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
