#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run after graft.Verify has
dumped query results + oracle_sql.json, compare each result against DuckDB
over the same parquet tables. Dev tool only — the engine itself is pure Scala.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison: timestamps → ns, ints → int64
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif str(df[c].dtype) in ("int32", "int16", "int8", "uint32", "Int64", "Int32"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=True)
            # Mirror the driver's hash compare exactly: it row-sorts the
            # frame in pandas (unhashable ndarray cells crash there — r6
            # x4_quantize_int8) and hashes RENDERED values, so an int64 123
            # vs a HUGEINT->float 123.0 is a mismatch even when the numbers
            # agree (r6 x_source_mix).
            gs = got.sort_values(by=list(got.columns)).reset_index(drop=True).astype(str)
            es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True).astype(str)
            if not gs.equals(es):
                bad = [c for c in gs.columns if not gs[c].equals(es[c])]
                print(f"FAIL {name}: value-render mismatch in {bad} "
                      f"(e.g. {gs[bad[0]].iloc[0]!r} vs {es[bad[0]].iloc[0]!r})")
                n_fail += 1; continue
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")
            print(f"FAIL {name}: {msg[0]} {msg[1] if len(msg)>1 else ''}")
            n_fail += 1
        except TypeError as e:
            print(f"FAIL {name}: driver-sort mirror crashed: {e}"); n_fail += 1
    # rows-only queries
    import os
    checked = set(oracle)
    for p in sorted(glob.glob(f"{out_dir}/*")):
        name = os.path.basename(p)
        if os.path.isdir(p) and name not in checked:
            try:
                n = len(pd.read_parquet(p))
                print(f"ROWS {name} ({n} rows)")
            except Exception as e:
                print(f"FAIL {name} (rows-only): {e}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracle queries")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
