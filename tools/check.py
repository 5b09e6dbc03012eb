#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query in
<outdir>/oracle_sql.json, run the oracle in DuckDB over the testdata
parquet and compare with the Spark result parquet (columns sorted by
name, exact values). Usage: check.py <sfdir> <outdir>."""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(p.split("/")[-1] for p in glob.glob(f"{outdir}/q*"))
    n_ok = n_bad = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark result)"); n_bad += 1; continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracles:
            print(f"NOORACLE {name} rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"ORAFAIL  {name}: {str(e).splitlines()[0][:160]}"); n_bad += 1; continue
        s = spark_df[sorted(spark_df.columns)]
        d = duck_df[sorted(duck_df.columns)]
        if list(s.columns) != list(d.columns):
            print(f"SCHEMA   {name}: spark={list(s.columns)} duck={list(d.columns)}"); n_bad += 1; continue
        if len(s) != len(d):
            print(f"ROWS     {name}: spark={len(s)} duck={len(d)}"); n_bad += 1; continue
        s = s.reset_index(drop=True); d = d.reset_index(drop=True)
        bad_cols = []
        for c in s.columns:
            sv, dv = s[c], d[c]
            try:
                if not sv.equals(dv.astype(sv.dtype)):
                    # tolerate dtype-differing but value-equal columns
                    if not (sv.astype(str) == dv.astype(str)).all():
                        bad_cols.append(c)
            except Exception:
                if not (sv.astype(str) == dv.astype(str)).all():
                    bad_cols.append(c)
        if bad_cols:
            print(f"VALUES   {name}: cols {bad_cols}")
            for c in bad_cols[:2]:
                neq = (s[c].astype(str) != d[c].astype(str))
                i = neq.idxmax()
                print(f"  first diff row {i} col {c}: spark={s[c][i]!r} duck={d[c][i]!r}")
            n_bad += 1
        else:
            print(f"OK       {name} rows={len(s)}"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {len(names)} total")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
