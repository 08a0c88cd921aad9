#!/usr/bin/env python3
"""Scale-sweep correctness gate (r11 VERDICT #1): the driver-format compare of
verify_local.py, plus a ROUND-MATERIALIZED oracle for
llm_cluster_fixpoint — its shipped recursive-transitive-closure oracle
is quadratic in DuckDB (>55 CPU-min at sf1, r11) while one min-label
round per temp table is the q23/q25-proven tractable shape. The
materialized oracle computes the same fixpoint (min reachable id per
vertex over the symmetrized + self-looped candidate graph; labels are
monotone non-increasing, so changed==0 IS convergence), so a green row
carries the same evidential weight.

Usage: python3 tools/verify_sf1.py [sfDir] [outDir] [resultJson]
Assumes graft.Verify has written outDir/<name>/ + oracle_sql.json.
"""
import sys, os, json, glob, time
import duckdb
import pandas.api.types as pt

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graftdata/sf1"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1"
res_path = sys.argv[3] if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def fixpoint_oracle(sql):
    """Materialize the candidate-pair graph from the shipped oracle's own
    CTE prefix (so the edge definition cannot drift from the checked-in
    SQL), then iterate min-label rounds to convergence — one DuckDB temp
    table per round instead of one recursive closure."""
    prefix = sql.split("), reach AS (")[0]
    assert prefix != sql, "oracle SQL shape changed; update the splitter"
    edges_sql = prefix.replace("WITH RECURSIVE", "WITH", 1) + ")"
    con.sql(f"CREATE OR REPLACE TEMP TABLE edges AS {edges_sql} "
            "SELECT src, dst FROM edges")
    con.sql("CREATE OR REPLACE TEMP TABLE lab AS "
            "SELECT src, min(dst) AS lbl FROM edges GROUP BY src")
    rounds = 1
    while True:
        con.sql("CREATE OR REPLACE TEMP TABLE lab2 AS "
                "SELECT e.src, min(l.lbl) AS lbl "
                "FROM edges e JOIN lab l ON l.src = e.dst GROUP BY e.src")
        changed = con.sql(
            "SELECT count(*) FROM lab2 j JOIN lab o ON j.src = o.src "
            "WHERE j.lbl < o.lbl").fetchone()[0]
        con.sql("DROP TABLE lab")
        con.sql("ALTER TABLE lab2 RENAME TO lab")
        if changed == 0:
            break
        rounds += 1
        assert rounds <= 100, "min-label propagation did not converge"
    print(f"  [fixpoint oracle] converged in {rounds} rounds")
    return con.sql(
        "SELECT src AS vec_id, lbl AS component FROM lab ORDER BY vec_id").df()


ORACLE_OVERRIDES = {"llm_cluster_fixpoint": fixpoint_oracle}

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results, fails = {}, []
for name, sql in sorted(oracle.items()):
    spark_glob = f"{out_dir}/{name}/*.parquet"
    row = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    results[name] = row
    if not glob.glob(spark_glob):
        row["err"] = "no spark output"
        fails.append((name, row["err"]))
        continue
    t0 = time.time()
    try:
        got = con.sql(f"SELECT * FROM '{spark_glob}'").df()
        want = (ORACLE_OVERRIDES[name](sql) if name in ORACLE_OVERRIDES
                else con.sql(sql).df())
    except Exception as e:
        row["err"] = f"exec error: {e}"
        fails.append((name, row["err"]))
        continue
    row["spark_rows"], row["oracle_rows"] = len(got), len(want)
    gc, wc = sorted(got.columns), sorted(want.columns)
    row["schema_match"] = gc == wc
    row["rows_match"] = len(got) == len(want)
    if not (row["schema_match"] and row["rows_match"]):
        fails.append((name, f"schema/rows differ: {gc} vs {wc}, "
                            f"{len(got)} vs {len(want)}"))
        continue
    g = got[gc].sort_values(by=gc, kind="mergesort").reset_index(drop=True)
    w = want[wc].sort_values(by=wc, kind="mergesort").reset_index(drop=True)
    for c in gc:  # same dtype alignment as verify_local.py
        if pt.is_numeric_dtype(g[c]) and pt.is_numeric_dtype(w[c]) \
                and g[c].dtype != w[c].dtype:
            def _integral(s):
                return pt.is_integer_dtype(s) or \
                    (pt.is_float_dtype(s) and s.notna().all()
                     and (s == s.round()).all())
            if _integral(g[c]) and _integral(w[c]):
                g[c] = g[c].astype("int64"); w[c] = w[c].astype("int64")
            else:
                g[c] = g[c].astype("float64"); w[c] = w[c].astype("float64")
    neq = (g.astype(str) != w.astype(str))
    row["hash_match"] = not neq.any().any()
    if not row["hash_match"]:
        bad = neq.any(axis=1)
        fails.append((name, f"{int(bad.sum())} differing rows"))
        continue
    print(f"PASS {name} ({len(got)} rows, oracle {time.time()-t0:.1f}s)")

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
npass = len(results) - len(fails)
print(f"\n{npass} pass / {len(fails)} fail")

if res_path:
    # r13 VERDICT #7: merge graft.Verify's machine-readable protocol
    # stamp (derived shuffle width, codegen cache size, build commit)
    # so the artifact is self-describing without SCALE.md cross-ref.
    try:
        stamp = json.load(open(f"{out_dir}/run_meta.json"))
    except Exception:
        stamp = {}
    results["_meta"] = {
        **stamp,
        "sf_dir": f"{sf_dir} (tools/gen_sfn.py, key-shifted "
                  "replication of sf0.1)",
        "round": int(os.environ.get("GRAFT_ROUND", 0)) or None,
        "note": "r11 VERDICT #1: llm_cluster_fixpoint now checked at sf1 "
                "via the round-materialized min-label oracle in "
                "tools/verify_sf1.py (one DuckDB temp table per round, "
                "convergence = zero label decreases; same fixpoint as the "
                "shipped recursive-closure SQL, which is oracle-side "
                "quadratic and did not finish sf1 in 55 CPU-min in r11). "
                "All other rows use the shipped oracle SQL verbatim. "
                f"{npass} pass / {len(fails)} fail.",
    }
    with open(res_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {res_path}")
sys.exit(1 if fails else 0)
