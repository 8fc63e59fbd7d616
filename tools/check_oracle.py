#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs Verify parquet dumps.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Mimics the driver's t2 gate: for each query with an oracle, run the SQL
in DuckDB against the sfDir parquet tables and compare with the Spark
result exactly (column names sorted, values compared cell-wise).
Driver-side tooling only — not part of the Spark library.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def type_sig(col):
    """Canonical type signature for the driver's typed-hash comparison.

    Typed (non-object) columns use the pandas dtype kind+width; object
    columns use the Python class of the first non-null cell (str,
    Decimal, date, bytes, ndarray, ...). Timestamp unit (ns/us) is
    collapsed — the parquet physical unit differs between writers but
    both decode to the same logical TIMESTAMP.
    """
    dt = col.dtype
    if str(dt).startswith("datetime64"):
        return "timestamp"
    if dt != object:
        return str(dt)
    nn = col.dropna()
    if len(nn) == 0:
        return "object:empty"
    return f"object:{type(nn.iloc[0]).__name__}"

def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            pass
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    manifest = []
    mpath = os.path.join(outdir, "queries.json")
    if os.path.exists(mpath):
        manifest = json.load(open(mpath))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            # arrow path keeps DECIMAL as Decimal objects; fetchdf()
            # would round-trip through float64 and produce false
            # mismatches for unscaled values beyond 2^53
            duck_df = con.execute(sql).arrow().to_pandas(types_mapper=None)
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}"); n_fail += 1; continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}"); n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        bad = []
        for c in s.columns:
            sv, dv = s[c], d[c]
            # typed-representation gate (mirrors the driver's hash, which
            # is sensitive to the full type, not just the value): a LONG
            # column on one side must be a LONG on the other — DuckDB
            # HUGEINT (SUM of ints), INT32-vs-INT64, DATE-vs-TIMESTAMP,
            # Decimal-vs-float all hash differently at the driver even
            # when every cell compares equal, so fail them here first
            st, dt = type_sig(sv), type_sig(dv)
            if st != dt:
                bad.append((c, f"type mismatch spark={st} duck={dt} "
                               "(driver hash would fail even if values match)"))
                continue
            try:
                if sv.dtype.kind == 'f' or dv.dtype.kind == 'f':
                    eq = (sv.astype(float).values == dv.astype(float).values) | (sv.isna().values & dv.isna().values)
                else:
                    eq = (sv.astype(str).values == dv.astype(str).values)
            except Exception as e:
                bad.append((c, f"compare error {e}")); continue
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append((c, f"row {i}: spark={sv.iloc[i]!r} duck={dv.iloc[i]!r} ({int((~eq).sum())} diffs)"))
        if bad:
            print(f"FAIL {name}: " + "; ".join(f"{c}: {m}" for c, m in bad)); n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    # rows-only queries: every manifest entry must have produced output
    rows_only = [n for n in (manifest or sorted(os.listdir(outdir)))
                 if n not in oracle and n not in ("oracle_sql.json", "queries.json")]
    for name in rows_only:
        df = load_spark(outdir, name)
        if df is None:
            print(f"FAIL {name}: rows-only query produced no output"); n_fail += 1
        elif len(df) == 0:
            print(f"WARN {name}: rows-only, 0 rows")
        else:
            print(f"INFO {name}: rows-only, {len(df)} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
