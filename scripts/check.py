#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

1. Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run
   (or runs it with --run).
2. Registers the sfDir parquet tables as DuckDB views, runs each SQL in
   outDir/oracle_sql.json, and compares against outDir/<name>/ parquet:
   columns sorted by name, rows sorted by all columns, values compared
   BITWISE, and arrow dtypes compared (DuckDB HUGEINT vs Spark BIGINT is a
   hash mismatch in the driver even when values agree). Any non-bitwise or
   dtype difference is a hard FAIL — this gate must predict the driver's
   hash_match exactly.
"""
import json, sys, glob, math, subprocess

import duckdb
import pandas as pd
import numpy as np
import pyarrow.parquet as pq


# Arrow type aliases the driver's hasher treats as identical (value render is
# the same). Anything else — notably DuckDB HUGEINT (int128/decimal(38,0))
# vs Spark BIGINT — renders differently and MUST be a hard failure.
_TYPE_ALIAS = {
    "large_string": "string",
    "large_binary": "binary",
}


def _norm_type(t):
    s = str(t)
    # timestamps: spark writes timestamp[us/ns, tz=UTC]; duckdb TIMESTAMP is
    # tz-naive us. Same wall-clock render → alias.
    if s.startswith("timestamp"):
        return "timestamp"
    # Integer WIDTHS render identically (calibrated on round-1 driver-green
    # queries: spark int32 row_number vs duckdb int64 ROW_NUMBER hashed
    # equal). HUGEINT arrives as decimal128(38,0) — NOT in this set, so the
    # int128 class of failure stays a hard FAIL.
    if s in ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64"):
        return "int"
    return _TYPE_ALIAS.get(s, s)


def arrow_types_spark(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    types = {}
    for f in files:
        sch = pq.read_schema(f)
        for name, t in zip(sch.names, sch.types):
            types[name] = _norm_type(t)
    return types



TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark_result(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types a bit: pandas may give object for decimals
    for c in df.columns:
        if df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], (int,)):
                df[c] = df[c].astype("int64")
    sort_cols = list(df.columns)
    df = df.sort_values(by=sort_cols, kind="mergesort").reset_index(drop=True)
    return df


def compare(name, spark_df, duck_df):
    issues = []
    s, d = normalize(spark_df), normalize(duck_df)
    if list(s.columns) != list(d.columns):
        return [f"columns differ: spark={list(s.columns)} duck={list(d.columns)}"]
    if len(s) != len(d):
        return [f"row count differ: spark={len(s)} duck={len(d)}"]
    for c in s.columns:
        sv, dv = s[c].values, d[c].values
        if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(d[c].dtype, np.floating):
            sv = np.asarray(sv, dtype=np.float64)
            dv = np.asarray(dv, dtype=np.float64)
            nan_mismatch = np.isnan(sv) != np.isnan(dv)
            if nan_mismatch.any():
                i = int(np.argmax(nan_mismatch))
                issues.append(f"col {c}: one-sided NaN at row {i}: spark={sv[i]!r} duck={dv[i]!r}")
                continue
            both_nan = np.isnan(sv) & np.isnan(dv)
            exact = np.array_equal(sv.view(np.int64), dv.view(np.int64))
            if not exact:
                diff = np.where(both_nan, 0.0, np.abs(sv - dv))
                denom = np.maximum(np.abs(dv), 1e-300)
                rel = np.where(both_nan, 0.0, diff / denom)
                mx = rel.max() if len(rel) else 0.0
                i = int(np.argmax(rel)) if len(rel) else 0
                # non-bitwise is a HARD failure: the driver hashes exact values
                issues.append(f"col {c}: NOT BITWISE (max rel {mx:.3e}) at row {i}: spark={sv[i]!r} duck={dv[i]!r}")
        else:
            eq = (s[c].astype(str).values == d[c].astype(str).values)
            if not eq.all():
                i = int(np.argmin(eq))
                issues.append(f"col {c}: mismatch at row {i}: spark={s[c].iloc[i]!r} duck={d[c].iloc[i]!r}")
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
    if "--run" in sys.argv:
        subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
                       check=True, cwd="/root/repo")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    spark_dirs = {p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json")}
    for name in sorted(spark_dirs | set(oracle)):
        if name not in oracle:
            df = load_spark_result(f"{out_dir}/{name}")
            nrows = 0 if df is None else len(df)
            status = "ROWS-ONLY" + (" (EMPTY!)" if nrows == 0 else f" rows={nrows}")
            print(f"  {name}: {status}")
            continue
        if name not in spark_dirs:
            print(f"  {name}: FAIL — oracle present but no spark output")
            n_fail += 1
            continue
        spark_df = load_spark_result(f"{out_dir}/{name}")
        try:
            # ONE DuckDB execution per oracle: values and arrow dtypes both
            # derive from the same fetched table (some oracles are
            # quadratic pair joins — do not run them twice)
            duck_tbl = con.execute(oracle[name]).fetch_arrow_table()
            # date_as_object=False keeps DATE as datetime64 — the same
            # pandas dtype fetchdf() produced, so the comparison branch
            # (and thus the gate's calibration) does not shift
            duck_df = duck_tbl.to_pandas(date_as_object=False)
        except Exception as e:
            print(f"  {name}: FAIL — duckdb error: {e}")
            n_fail += 1
            continue
        issues = compare(name, spark_df, duck_df)
        # Arrow-level dtype comparison: the driver's hasher renders typed
        # values, so e.g. DuckDB HUGEINT vs Spark BIGINT hash-mismatches even
        # when values are numerically equal. Catch it here, pre-driver.
        st = arrow_types_spark(f"{out_dir}/{name}")
        dt = {n2: _norm_type(t) for n2, t in
              zip(duck_tbl.schema.names, duck_tbl.schema.types)}
        for c in sorted(set(st) | set(dt)):
            a, b = st.get(c), dt.get(c)
            if a != b:
                issues.append(f"col {c}: ARROW DTYPE mismatch: spark={a} duck={b}")
        if not issues:
            print(f"  {name}: PASS (exact, {len(spark_df)} rows)")
            n_pass += 1
        else:
            print(f"  {name}: FAIL")
            for i in issues:
                print(f"      {i}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
