#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and diff against the Spark result
parquet written by graft.Verify.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, glob, json
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
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet files in spark output")
            n_fail += 1
            continue
        try:
            spark_res = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            duck_res = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        # driver semantics: sort columns by name, then compare value multisets
        s_cols = sorted(spark_res.columns)
        d_cols = sorted(duck_res.columns)
        if [c.lower() for c in s_cols] != [c.lower() for c in d_cols]:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        s_rows = sorted([tuple(norm(v) for v in r) for r in
                         spark_res[s_cols].itertuples(index=False, name=None)],
                        key=repr)
        d_rows = sorted([tuple(norm(v) for v in r) for r in
                         duck_res[d_cols].itertuples(index=False, name=None)],
                        key=repr)
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(s_rows, d_rows) if repr(a) != repr(b)]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; first: "
                  f"spark={bad[0][0]} duck={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
