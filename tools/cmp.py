import sys, json, glob, math
import duckdb, pandas as pd
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]
def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True, key=lambda s: s.astype(str))
    return df.reset_index(drop=True)
def compare(name, sql, sfdir='/root/testdata/sf0.01', outdir='/tmp/verify_out'):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    got = norm(con.execute(f"SELECT * FROM read_parquet({files!r})").df())
    exp = norm(con.execute(sql).df())
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name} cols: spark={list(got.columns)} oracle={list(exp.columns)}"); return False
    if len(got) != len(exp):
        print(f"FAIL {name} rows: spark={len(got)} oracle={len(exp)}"); return False
    for c in got.columns:
        if str(got[c].dtype) != str(exp[c].dtype):
            print(f"WARN {name} dtype[{c}]: {got[c].dtype} vs {exp[c].dtype}")
        for i in range(len(got)):
            a, b = got[c].iloc[i], exp[c].iloc[i]
            if pd.isna(a) and pd.isna(b): continue
            if isinstance(a, float) or isinstance(b, float):
                if float(a) == float(b): continue
                if not math.isclose(float(a), float(b), rel_tol=0, abs_tol=0):
                    print(f"FAIL {name} [{c}][{i}]: {a!r} != {b!r}"); return False
            elif str(a) != str(b):
                print(f"FAIL {name} [{c}][{i}]: {a!r} != {b!r}"); return False
    print(f"PASS {name} ({len(got)} rows)"); return True
