#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir] [artifact.json]
Assumes graft.Verify has already written outDir/<name>/ parquet dirs and
outDir/oracle_sql.json (run via: sbt "runMain graft.Verify <sfDir> <outDir>").

With a third arg, also writes a CORRECTNESS-shaped JSON artifact whose
`_meta` merges outDir/run_meta.json (build commit, derived shuffle width,
codegen cache — r14 VERDICT #4: the sf0.01 compare path must be as
self-describing as the sf1000 one).

Compares each Spark result against DuckDB running the oracle SQL over the
same parquet tables: column names (sorted), row count, and exact values
(rows sorted by all columns). Any mismatch is printed with a sample diff.
"""
import sys, json, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
res_path = sys.argv[3] if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, results = [], [], {}
for name, sql in sorted(oracle.items()):
    row = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    results[name] = row
    def _fail(msg):
        row["err"] = msg
        fails.append((name, msg))
    spark_glob = f"{out_dir}/{name}/*.parquet"
    if not glob.glob(spark_glob):
        _fail("no spark output")
        continue
    try:
        got = con.sql(f"SELECT * FROM '{spark_glob}'").df()
        want = con.sql(sql).df()
    except Exception as e:
        _fail(f"exec error: {e}")
        continue
    row["spark_rows"], row["oracle_rows"] = len(got), len(want)
    gc, wc = sorted(got.columns), sorted(want.columns)
    row["schema_match"] = gc == wc
    row["rows_match"] = len(got) == len(want)
    if gc != wc:
        _fail(f"columns differ: spark={gc} oracle={wc}")
        continue
    if len(got) != len(want):
        _fail(f"rowcount differs: spark={len(got)} oracle={len(want)}")
        continue
    g = got[gc].sort_values(by=gc, kind="mergesort").reset_index(drop=True)
    w = want[wc].sort_values(by=wc, kind="mergesort").reset_index(drop=True)
    # align dtype drift (e.g. DuckDB HUGEINT -> float64 vs Spark int64)
    # before string-compare, so only real value differences fail. When
    # both sides are integer-valued, compare as int64 — a float64 cast
    # would silently equate distinct ints above 2^53.
    for c in gc:
        import pandas.api.types as pt
        if pt.is_numeric_dtype(g[c]) and pt.is_numeric_dtype(w[c]) \
                and g[c].dtype != w[c].dtype:
            def _integral(s):
                return pt.is_integer_dtype(s) or \
                    (pt.is_float_dtype(s) and s.notna().all()
                     and (s == s.round()).all())
            if _integral(g[c]) and _integral(w[c]):
                g[c] = g[c].astype("int64")
                w[c] = w[c].astype("int64")
            else:
                g[c] = g[c].astype("float64")
                w[c] = w[c].astype("float64")
    g = g.astype(str)
    w = w.astype(str)
    neq = (g != w)
    if neq.any().any():
        bad = neq.any(axis=1)
        idx = bad[bad].index[:3]
        diff = "\n".join(
            f"  row {i}: spark={g.loc[i].to_dict()} oracle={w.loc[i].to_dict()}"
            for i in idx)
        _fail(f"{int(bad.sum())} differing rows:\n{diff}")
        continue
    row["hash_match"] = True
    passes.append((name, len(got)))

for name, n in passes:
    # an empty-vs-empty match proves nothing — q6's oracle box was
    # unsatisfiable for five rounds and "passed" the whole time; make
    # vacuous rows impossible to miss without failing the gate
    flag = "  ** VACUOUS (0 rows) — tighten the query or the oracle **" if n == 0 else ""
    print(f"PASS {name} ({n} rows){flag}")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
rows_only = [os.path.basename(d) for d in glob.glob(out_dir + "/*")
             if os.path.isdir(d) and os.path.basename(d) not in oracle]
print(f"\n{len(passes)} pass / {len(fails)} fail "
      f"(+{len(rows_only)} rows-only queries not checked)")

if res_path:
    # r14 VERDICT #4: the sf0.01 artifact must carry the same
    # machine-readable protocol stamp the sf1000 one does — merge
    # graft.Verify's run_meta.json (build commit, derived shuffle
    # width, codegen cache) into `_meta`.
    try:
        stamp = json.load(open(f"{out_dir}/run_meta.json"))
    except Exception:
        stamp = {}
    results["_meta"] = {
        **stamp,
        "round": int(os.environ.get("GRAFT_ROUND", 0)) or None,
        "rows_only_unchecked": sorted(rows_only),
        "note": f"{len(passes)} pass / {len(fails)} fail; shipped oracle "
                "SQL verbatim (no restaging at this scale).",
    }
    with open(res_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {res_path}")
sys.exit(1 if fails else 0)
