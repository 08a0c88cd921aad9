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


def _staged_scored_table(lm_sql):
    """Materialize the lmScore per-doc scores as TEMP TABLE scored_t,
    derived from the shipped SQL's own CTE bodies (so the semantics
    cannot drift from the checked-in oracle), re-STAGED so the
    corpus-scale bg CTE is never referenced twice in one statement.

    Why: the shipped text references bg from both the c2 model build
    and the scoring join; DuckDB materializes multi-referenced CTEs,
    and at sf1000 that is a 2.66 B-row temp spill that exceeded this
    box's free disk (r14 — the same wall, role-reversed, that the
    Spark side hit in r13 before the model-broadcast fix). Staging the
    two Heaps-scale model relations as temp tables and keeping every
    bg reference single (single-referenced CTEs inline and STREAM in
    DuckDB) makes the oracle one streaming pass per bg use — the exact
    shape the Spark plan runs. Each stage's SELECT body is the shipped
    text verbatim."""
    if getattr(_staged_scored_table, "_built_from", None) == lm_sql.strip():
        return  # both scorer oracles share one corpus-scale build
    def body(text, start, end):
        a = text.index(start) + len(start)
        return text[a:text.index(end, a)]
    w_b = body(lm_sql, "WITH w AS (", "), bg AS (")
    bg_b = body(lm_sql, "), bg AS (", "), c2 AS (")
    c2_b = body(lm_sql, "), c2 AS (", "), c1 AS (")
    c1_b = body(lm_sql, "), c1 AS (", "), v AS (")
    v_b = body(lm_sql, "), v AS (", "\n)\nSELECT bg.doc_id")
    tail = lm_sql[lm_sql.index("\nSELECT bg.doc_id") + 1:]
    # Chunk every corpus-scale pass by doc_id range: DuckDB's grouped
    # aggregation spills its INPUT partitions when the probe stream
    # outgrows memory, and at sf1000 one un-chunked scoring pass spills
    # ~70 GB (measured — it filled this box's free disk even with the
    # staged CTEs). Per-doc grouping is exact under doc-range chunking,
    # and the model build is the standard two-level aggregation
    # (per-chunk counts, then sum by key — identical for count(*)).
    lo, hi = con.sql(f"SELECT min(doc_id), max(doc_id) + 1 "
                     f"FROM ({w_b}) _w").fetchone()
    n_docs = con.sql(f"SELECT count(*) FROM ({w_b}) _w").fetchone()[0]
    k = max(2, (n_docs + 4_999_999) // 5_000_000)
    bounds = [lo + (hi - lo) * i // k for i in range(k + 1)]
    print(f"  [scorer oracle] {n_docs} docs, {k} doc-range chunks")

    def wbg(a, b):
        return (f"WITH w AS (SELECT * FROM ({w_b}) _w "
                f"WHERE doc_id >= {a} AND doc_id < {b}), bg AS ({bg_b})")

    for i in range(k):
        stmt = f"{wbg(bounds[i], bounds[i + 1])} {c2_b}"
        con.sql((f"CREATE OR REPLACE TEMP TABLE c2_part AS {stmt}" if i == 0
                 else f"INSERT INTO c2_part {stmt}"))
    con.sql("CREATE OR REPLACE TEMP TABLE c2_t AS SELECT w1, w2, "
            "CAST(sum(c2) AS BIGINT) AS c2 FROM c2_part GROUP BY 1, 2")
    con.sql("DROP TABLE c2_part")
    con.sql(f"CREATE OR REPLACE TEMP TABLE c1_t AS "
            f"WITH c2 AS (SELECT * FROM c2_t) {c1_b}")
    con.sql(f"CREATE OR REPLACE TEMP TABLE v_t AS {v_b}")
    for i in range(k):
        stmt = (f"{wbg(bounds[i], bounds[i + 1])}, "
                f"c2 AS (SELECT * FROM c2_t), c1 AS (SELECT * FROM c1_t), "
                f"v AS (SELECT * FROM v_t) {tail}")
        con.sql((f"CREATE OR REPLACE TEMP TABLE scored_t AS {stmt}" if i == 0
                 else f"INSERT INTO scored_t {stmt}"))
    _staged_scored_table._built_from = lm_sql.strip()


def lm_score_oracle(sql):
    _staged_scored_table(sql)
    return con.sql("SELECT * FROM scored_t ORDER BY doc_id").df()


def ppl_buckets_oracle(sql):
    """The shipped ppl_buckets oracle embeds the whole scorer as its
    `scored` CTE; stage that via _staged_scored_table and run the
    bucket tail verbatim against the temp table."""
    marker = "\n), j AS (\n"
    head, tail = sql.split(marker, 1)
    assert head.startswith("WITH scored AS ("), "oracle shape changed"
    _staged_scored_table(head[len("WITH scored AS ("):])
    return con.sql("WITH scored AS (SELECT * FROM scored_t), j AS (\n"
                   + tail).df()


ORACLE_OVERRIDES = {"llm_cluster_fixpoint": fixpoint_oracle,
                    "llm_lm_score": lm_score_oracle,
                    "llm_ppl_buckets": ppl_buckets_oracle}

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results, fails, used_overrides = {}, [], []
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
        if name in ORACLE_OVERRIDES:
            want = ORACLE_OVERRIDES[name](sql)
            # Only record the override AFTER it ran: a restaged oracle
            # that throws must not be listed as "used" (r14 ADVICE).
            used_overrides.append(name)
        else:
            want = con.sql(sql).df()
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
        "oracle_overrides_used": sorted(set(used_overrides)),
        "note": "Rows in oracle_overrides_used ran the tractability-"
                "restaged oracles in tools/verify_sf1.py (fixpoint: "
                "round-materialized min-label propagation, r11 VERDICT #1; "
                "lmScore family: the shipped SQL's own CTE bodies re-run "
                "per doc_id-range chunk with the model relations staged as "
                "temp tables, r14 — DuckDB materializes the multi-"
                "referenced corpus-scale bg CTE and spills past this box's "
                "disk otherwise; proven bit-identical to the shipped SQL "
                "at sf1). All other rows use the shipped oracle SQL "
                f"verbatim. {npass} pass / {len(fails)} fail.",
    }
    with open(res_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {res_path}")
sys.exit(1 if fails else 0)
