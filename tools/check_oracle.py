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


def render(v) -> str:
    """Render a cell the way the driver's value hash does: floats keep
    their sign (so -0.0 != 0.0) and their float-ness (so 1.0 != 1).
    float(a)==float(b) compares were blind to exactly these divergences
    (q139 r9, q184/q240 r10, q268 r11)."""
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    import numpy as np
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    return str(v)


def cells_equal(a, b) -> bool:
    return render(a) == render(b)


def lint_neg_zero(con, sql: str) -> list:
    """Run the oracle and flag any float cell rendering as -0.0: DuckDB
    preserves IEEE signed zero (e.g. ROUND(-s, 6) of an exact-zero slope)
    while Spark's round normalizes through BigDecimal, so the driver hash
    sees '-0.0' vs '0.0' (q268 r11). Fix: `expr + 0` in the oracle SQL."""
    df = con.sql(sql).df()
    hits = []
    for c in df.columns:
        col = df[c]
        if col.dtype.kind != "f":
            continue
        for i, v in enumerate(col):
            if v == 0.0 and not pd.isna(v) and repr(float(v)).startswith("-"):
                hits.append(f"{c}[row {i}]")
                break
    return hits


def self_test() -> int:
    """Seeded regression for the render-divergence class: the compare and
    the lint must both see IEEE -0.0 and int-vs-float divergences that
    float() equality is blind to."""
    con = duckdb.connect()
    checks = [
        # NB: a bare -0.0 literal parses as DECIMAL and loses the sign;
        # a DOUBLE expression (like regr_slope) negated to zero keeps it.
        ("lint flags a seeded -0.0 oracle",
         bool(lint_neg_zero(con, "SELECT -CAST(0.0 AS DOUBLE) AS z"))),
        ("lint flags ROUND(-s,6) of an exact-zero slope",
         bool(lint_neg_zero(
             con, "SELECT ROUND(-regr_slope(y, x), 6) AS decay "
                  "FROM (VALUES (1.0, 1.0), (1.0, 2.0)) t(y, x)"))),
        ("lint passes a normalized (+0) oracle",
         not lint_neg_zero(
             con, "SELECT ROUND(-regr_slope(y, x), 6) + 0 AS decay "
                  "FROM (VALUES (1.0, 1.0), (1.0, 2.0)) t(y, x)")),
        ("compare: -0.0 != 0.0", not cells_equal(-0.0, 0.0)),
        ("compare: 1.0 != 1 (float-ness is part of the render)",
         not cells_equal(1.0, 1)),
        ("compare: 0.5 == 0.5", cells_equal(0.5, 0.5)),
        ("compare: nulls equal", cells_equal(float("nan"), None)),
    ]
    bad = [name for name, ok in checks if not ok]
    for name, ok in checks:
        print(f"{'PASS' if ok else 'FAIL'} {name}")
    print(f"\nself-test: {len(checks) - len(bad)}/{len(checks)} checks pass")
    return 1 if bad else 0


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
                negz = lint_neg_zero(con, oracles[name])
            except Exception as e:
                print(f"FAIL {name}: {e}")
                failures += 1
                continue
            if widened:
                print(f"LINT {name}: driver-hash-unsafe types {widened}")
                failures += 1
            if negz:
                print(f"LINT {name}: oracle emits IEEE -0.0 at {negz} — "
                      f"normalize with `expr + 0` in the oracle SQL")
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
    # every oracle-less dump must be DECLARED rows-only in the artifact
    # Verify writes beside the dumps — an undeclared one is a query that
    # silently lost its oracle, which is a failure here, not a footnote
    ro_path = f"{out_dir}/rows_only.json"
    if os.path.exists(ro_path):
        declared = set(json.load(open(ro_path)))
        undeclared = sorted(set(names_no_oracle) - declared)
        stale = sorted(declared - set(names_no_oracle))
        for n in undeclared:
            print(f"FAIL {n}: no oracle and NOT declared rows-only")
            failures += 1
        for n in stale:
            print(f"FAIL rows_only.json declares {n} but no such dump exists")
            failures += 1
    print(f"\n{failures} failures / {len(oracles)} oracle-checked")
    return 1 if failures else 0


if __name__ == "__main__":
    if "--self-test" in sys.argv:
        sys.exit(self_test())
    args = [a for a in sys.argv[1:] if a != "--lint-only"]
    sys.exit(main(args[0], args[1], lint_only="--lint-only" in sys.argv))
