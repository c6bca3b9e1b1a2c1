#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare (order-insensitive, column-name sorted).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize floats and sort rows for order-insensitive compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.decode() if isinstance(v, bytes) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver hashes RENDERED values: spark int64 "1540" vs duck
        # float64 "1540.0" mismatches even when numerically equal. DuckDB
        # HUGEINT (sum of BIGINT) lands in pandas as float64 — the exact
        # class behind the r5 q91 / r7 q107 red rows. Flag it hard here so
        # the local gate is driver-faithful.
        if (av.dtype.kind in "iu") != (bv.dtype.kind in "iu") and \
           {av.dtype.kind, bv.dtype.kind} & {"f"}:
            return (f"DTYPE col {c}: spark={av.dtype} duck={bv.dtype} "
                    "(driver renders these differently -> hash mismatch; "
                    "CAST the oracle column)")
        try:
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                ok = ((av.isna() & bv.isna()) | (av == bv)).all()
            else:
                ok = (av.astype(str).fillna("<null>") == bv.astype(str).fillna("<null>")).all()
        except Exception as e:
            return f"CMP-ERR col {c}: {e}"
        if not ok:
            bad = (~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))).idxmax()
            return f"VALUE col {c} row {bad}: spark={av[bad]!r} duck={bv[bad]!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional: --json <path> additionally writes the driver-shaped
    # CORRECTNESS dict (name -> rows/schema/hash match booleans)
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_fail = 0
    # Oracle type lint (VERDICT r7 #2): any HUGEINT/DECIMAL output column
    # is rendered by the driver differently from Spark's int64/double
    # (HUGEINT -> float64 "1540.0" vs "1540") — exactly the r5-q91/r7-q107
    # red-row class. DuckDB's own DESCRIBE is the precise detector; every
    # integer aggregate must carry an explicit CAST(.. AS BIGINT/INT).
    for name in sorted(oracles):
        try:
            d = con.sql("DESCRIBE " + oracles[name]).df()
        except Exception:
            continue  # oracle execution errors are reported in the main loop
        for _, r in d.iterrows():
            ct = r["column_type"]
            if ct in ("HUGEINT", "UHUGEINT") or ct.startswith("DECIMAL"):
                print(f"LINT {name}: column {r['column_name']} is {ct} — "
                      "add an explicit CAST (driver render mismatch)")
                n_fail += 1
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": 0,
                             "oracle_rows": None, "err": "no spark output"}
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {str(e)[:200]}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": int(len(spark_df)),
                             "oracle_rows": None, "err": f"oracle error {str(e)[:200]}"}
            n_fail += 1
            continue
        err = compare(name, spark_df, duck_df)
        results[name] = {
            "rows_match": not (err or "").startswith("ROWS"),
            "schema_match": not (err or "").startswith(("SCHEMA", "DTYPE")),
            "hash_match": err is None,
            "spark_rows": int(len(spark_df)),
            "oracle_rows": int(len(duck_df)),
            "err": err,
        }
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
            n_ok += 1
    # rows-only entries
    for p in sorted(glob.glob(f"{out_dir}/*/")):
        name = p.rstrip("/").split("/")[-1]
        if name not in oracles:
            files = glob.glob(f"{p}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"rows {name}: {n}")
    print(f"== {n_ok} ok, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"json written to {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
