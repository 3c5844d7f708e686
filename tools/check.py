#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare against the Verify.scala
parquet dumps (column-name-sorted, row-sorted, value-compared)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver testdata is single-file parquet; Spark-written scale dirs
    # (MakeScale /tmp/sf1) are directories of part files — glob those
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
json_out = sys.argv[3] if len(sys.argv) > 3 else None
# closed world: iterate the DECLARED query set (queries_keys.json, written
# by Verify.scala) so a query that crashed or never ran shows as a red row
# instead of silently vanishing from the artifact. Fall back to listing
# output dirs only for pre-existing dumps without the declaration file.
keys_file = f"{out_dir}/queries_keys.json"
if os.path.exists(keys_file):
    declared = json.load(open(keys_file))
else:
    declared = [n for n in sorted(os.listdir(out_dir))
                if os.path.isdir(f"{out_dir}/{n}")]
fails, passes, skips = [], [], []
report = {}
for name in declared:
    p = f"{out_dir}/{name}"
    if not os.path.isdir(p):
        fails.append(f"{name}: NO OUTPUT (query absent from dump)")
        report[name] = {"rows_match": False, "schema_match": False,
                        "hash_match": False, "spark_rows": None,
                        "oracle_rows": None, "err": "no output (query absent)"}
        continue
    if os.path.exists(f"{p}/_ERROR"):
        msg = open(f"{p}/_ERROR").read().strip()
        fails.append(f"{name}: QUERY ERROR {msg}")
        report[name] = {"rows_match": False, "schema_match": False,
                        "hash_match": False, "spark_rows": None,
                        "oracle_rows": None, "err": f"query error: {msg}"}
        continue
    files = glob.glob(f"{p}/*.parquet")
    got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    if name not in oracle:
        skips.append(f"{name} (rows={len(got)}, rows-only)")
        report[name] = {"rows_match": None, "schema_match": None,
                        "hash_match": None, "spark_rows": len(got),
                        "oracle_rows": None, "err": "no_oracle"}
        continue
    report[name] = {"rows_match": False, "schema_match": False,
                    "hash_match": False, "spark_rows": len(got),
                    "oracle_rows": None, "err": None}
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append(f"{name}: ORACLE SQL ERROR {e}")
        report[name]["err"] = f"oracle sql error: {e}"
        continue
    report[name]["oracle_rows"] = len(exp)
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(e.columns):
        fails.append(f"{name}: COLS spark={list(g.columns)} duck={list(e.columns)}")
        continue
    report[name]["schema_match"] = True
    if len(g) != len(e):
        fails.append(f"{name}: ROWS spark={len(g)} duck={len(e)}")
        continue
    report[name]["rows_match"] = True
    gs = g.sort_values(by=list(g.columns), na_position="first").reset_index(drop=True)
    es = e.sort_values(by=list(e.columns), na_position="first").reset_index(drop=True)
    ok = True
    for c in g.columns:
        a, b = gs[c], es[c]
        try:
            pd.testing.assert_series_equal(a, b, check_dtype=False,
                                           check_exact=True, check_names=False)
        except AssertionError:
            ok = False
            diff = (a != b) & ~(a.isna() & b.isna())
            i = diff[diff].index[:3].tolist()
            fails.append(f"{name}: col {c} mismatch at rows {i}: "
                         f"spark={a.iloc[i[:1]].tolist() if i else '?'} "
                         f"duck={b.iloc[i[:1]].tolist() if i else '?'} "
                         f"dtypes {a.dtype}/{b.dtype}")
            break
    if ok:
        passes.append(name)
        report[name]["hash_match"] = True

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"SKIP {len(skips)}: {' '.join(skips)}")
print(f"FAIL {len(fails)}:")
for f in fails:
    print("  ", f)
if json_out:
    # record the checker's own versions + compare mode so a divergence
    # between two harnesses (the round-10 gate-red mystery) is
    # diagnosable from the artifact alone
    report["__meta__"] = {
        "duckdb": duckdb.__version__, "pandas": pd.__version__,
        "compare": "column-name-sorted, row-sorted, exact values",
        "sf_dir": sf_dir,
    }
    json.dump(report, open(json_out, "w"), indent=2, sort_keys=True)
sys.exit(1 if fails else 0)
