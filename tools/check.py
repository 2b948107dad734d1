#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <verifyOutDir> <sfDir>

Reads <verifyOutDir>/oracle_sql.json, registers the sf parquet tables as
DuckDB views, runs each oracle SQL, and compares against the Spark-written
parquet in <verifyOutDir>/<name>/ — columns sorted by name, rows sorted by
all columns, exact value compare (floats compared exactly, then with 1e-9
rel tolerance as a secondary diagnostic).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def cells_equal(a, b):
    # array-valued cells (list columns come back as ndarray/list): compare
    # element-wise — mirrors the driver's value-hash over stringified lists
    # struct-valued cells (DuckDB STRUCT -> dict): compare key sets AND
    # values — iterating a dict yields keys only, which would silently
    # skip the values
    if isinstance(a, dict) or isinstance(b, dict):
        if not (isinstance(a, dict) and isinstance(b, dict)):
            return False
        if set(a.keys()) != set(b.keys()):
            return False
        return all(cells_equal(a[k], b[k]) for k in a)
    def arrlike(v):
        return not isinstance(v, (str, bytes)) and hasattr(v, "__len__")
    if arrlike(a) or arrlike(b):
        if not (arrlike(a) and arrlike(b)):
            return False
        la, lb = list(a), list(b)
        if len(la) != len(lb):
            return False
        return all(cells_equal(x, y) for x, y in zip(la, lb))
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if af == bf:
            return True
        return math.isclose(af, bf, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        probs = []
        if list(got.columns) != list(exp.columns):
            probs.append(f"columns spark={list(got.columns)} oracle={list(exp.columns)}")
        elif len(got) != len(exp):
            probs.append(f"rowcount spark={len(got)} oracle={len(exp)}")
        else:
            for c in got.columns:
                if str(got[c].dtype) != str(exp[c].dtype):
                    probs.append(f"dtype[{c}] spark={got[c].dtype} oracle={exp[c].dtype}")
            bad = []
            for c in got.columns:
                for i in range(len(got)):
                    if not cells_equal(got[c].iloc[i], exp[c].iloc[i]):
                        bad.append((c, i, got[c].iloc[i], exp[c].iloc[i]))
                        if len(bad) >= 3:
                            break
                if len(bad) >= 3:
                    break
            if bad:
                probs.append(f"values {bad}")
        if probs:
            print(f"FAIL {name}: " + "; ".join(probs))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
