#!/usr/bin/env python3
"""Local development harness mirroring the driver's correctness gate:
reads each Verify output parquet, runs the matching oracle SQL in DuckDB
over the same fixture tables, sorts columns by name, and compares values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints vs floats: leave as-is, compare cell-wise with repr
    return df.reset_index(drop=True)


BANNED_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def lint_types(con, name: str, sql: str) -> list:
    """DuckDB widens some expressions (windowed SUM -> HUGEINT, exact
    division -> DECIMAL) to types the driver's value hash renders
    differently from Spark's (e.g. "1.0" vs "1"), so values that compare
    equal here still hash-FAIL the driver gate (q139 r9, q184/q240 r10).
    Flag any oracle result column of such a type; the fix is an explicit
    CAST in the oracle SQL."""
    rel = con.sql(sql)
    return [f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
            if any(b in str(t).upper() for b in BANNED_TYPES)]


def cells_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def main(sf_dir: str, out_dir: str, lint_only: bool = False) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    if lint_only:
        for name in sorted(oracles):
            try:
                widened = lint_types(con, name, oracles[name])
            except Exception as e:
                print(f"FAIL {name}: {e}")
                failures += 1
                continue
            if widened:
                print(f"LINT {name}: driver-hash-unsafe types {widened}")
                failures += 1
        print(f"\n{failures} lint failures / {len(oracles)} oracles")
        return 1 if failures else 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            widened = lint_types(con, name, sql)
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            duck_df = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if widened:
            print(f"FAIL {name}: oracle result has driver-hash-unsafe types "
                  f"{widened} — add explicit CASTs in the oracle SQL")
            failures += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            failures += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            failures += 1
            continue
        bad = None
        for i in range(len(spark_df)):
            for c in spark_df.columns:
                a, b = spark_df.at[i, c], duck_df.at[i, c]
                if not cells_equal(a, b):
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
            failures += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
    names_no_oracle = [os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                       if os.path.isdir(p) and os.path.basename(p) not in oracles]
    for n in sorted(names_no_oracle):
        files = glob.glob(f"{out_dir}/{n}/*.parquet")
        rows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"ROWS {n}: {rows} (no oracle)")
    print(f"\n{failures} failures / {len(oracles)} oracle-checked")
    return 1 if failures else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--lint-only"]
    sys.exit(main(args[0], args[1], lint_only="--lint-only" in sys.argv))
