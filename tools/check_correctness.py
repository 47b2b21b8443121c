#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>

Reads each <name>.parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the sf
tables, and compares: row count, column names, and a hash of all values
with columns sorted by name and rows sorted by all columns.
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def table_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        for v in df[col]:
            if pd.isna(v):
                h.update(b"<null>")
            elif isinstance(v, float):
                h.update(repr(v).encode())
            else:
                h.update(str(v).encode())
            h.update(b"\x00")
        h.update(b"\x01")
    return h.hexdigest()

def main(out_dir, sf_dir):
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    results = {}
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(d)
        if not os.path.isdir(d):
            continue
        spark_df = pd.concat(
            [pd.read_parquet(p) for p in sorted(glob.glob(os.path.join(d, "*.parquet")))],
            ignore_index=True)
        if name not in oracles:
            results[name] = {"check": "rows_only", "rows": len(spark_df),
                             "ok": len(spark_df) > 0}
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = {"check": "oracle_error", "ok": False, "err": str(e)[:200]}
            continue
        s, o = canon(spark_df), canon(oracle_df)
        r = {"check": "oracle",
             "rows": (len(s), len(o)), "rows_ok": len(s) == len(o),
             "cols_ok": list(s.columns) == list(o.columns),
             "cols": (list(s.columns), list(o.columns))}
        if r["rows_ok"] and r["cols_ok"]:
            hs, ho = table_hash(s), table_hash(o)
            r["hash_ok"] = hs == ho
            if not r["hash_ok"]:
                # show first differing cell for debugging
                for col in s.columns:
                    neq = s[col].astype(str) != o[col].astype(str)
                    if neq.any():
                        i = neq.idxmax()
                        r["first_diff"] = {"col": col, "row": int(i),
                                           "spark": str(s[col][i]), "oracle": str(o[col][i])}
                        break
        r["ok"] = r.get("hash_ok", False) and r["rows_ok"] and r["cols_ok"]
        results[name] = r
    n_ok = sum(1 for r in results.values() if r["ok"])
    print(json.dumps(results, indent=2, default=str))
    print(f"\n{n_ok}/{len(results)} OK")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
