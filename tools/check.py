#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares each
<outDir>/<name> parquet against its DuckDB oracle from oracle_sql.json.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        # dtype KIND drift (e.g. DuckDB HUGEINT -> float64 vs Spark int64)
        # hashes differently driver-side even when Python == says values
        # match ("3.0" vs "3"). Width drift (int32 vs int64) is normalized
        # by the driver's hasher — observed green in CORRECTNESS_r02 — so
        # compare numpy kind (i/u vs f vs O), not exact dtype.
        def kind(d):
            k = d.kind
            return 'i' if k in 'iu' else k
        dt = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
              if kind(got[c].dtype) != kind(want[c].dtype)]
        if dt:
            print(f"FAIL {name}: dtype kind drift {dt}"); n_fail += 1; continue
        # exact cell compare, in emitted row order (both sides have a total ORDER BY)
        mism = []
        for c in got.columns:
            a, b = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y and not (x != x and y != y) and not (x is None and y is None):
                    # pandas turns SQL NULL into None or NaN depending on dtype
                    if (x is None or x != x) and (y is None or y != y):
                        continue
                    mism.append((c, i, x, y))
                    if len(mism) > 3: break
            if len(mism) > 3: break
        if mism:
            print(f"FAIL {name}: {len(mism)}+ cell mismatches, first: {mism[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
