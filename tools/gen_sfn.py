#!/usr/bin/env python3
"""Scale-sweep data generator: an N-fold key-shifted replication of an
existing testdata dir (default sf0.1 x10 ~= sf1), for PERF sweeps only
(no oracle runs against it).

Usage: python3 tools/gen_sfn.py [srcDir] [dstDir] [replicas]

Design (why not a naive row copy): every key column is shifted by a
replica-specific offset so joins and group-bys stay within a replica --
row counts, join fan-outs, group sizes and graph structure all scale
LINEARLY with the replica count, which is the property a scale sweep
measures. Two content perturbations keep similarity workloads honest:

- documents.text: every word is prefixed with the replica number
  (replica 0 keeps the original), so shingle/MinHash/SimHash candidate
  generation never collides ACROSS replicas -- a naive text copy puts 10
  identical docs in every LSH bucket and the pair space grows ~100x,
  which would misread as superlinear engine behavior.
- embeddings.embedding: dimensions are rotated by the replica number
  (np.roll), decorrelating replicas while preserving norms and the
  within-replica neighbor structure, for the same reason. Rotation
  alone saturates once replicas exceed the embedding width (64): at
  100 replicas, replicas r and r+64 roll by the same amount and are
  TRUE duplicates (the r12 sf10 sweep measured 144k of 200k vectors
  duplicated, inflating the LSH candidate-pair space ~16x). So every
  64-replica block past the first additionally applies a per-block
  deterministic coordinate SIGN MASK (dimension i flipped when
  hash(block, i) is odd). A uniform sign flip is an orthogonal
  transform: norms and all within-replica dot products are exactly
  preserved. Distinct blocks get distinct masks with overwhelming
  probability, NOT with certainty: the mask is the parity vector of
  hash(block, i), so two blocks collide only if all 64 parities agree
  (~2^-64 per block pair — an injective from-the-block-bits mask was
  considered and rejected because low block numbers would flip a
  single coordinate, recreating the near-duplicate saturation the
  mask exists to remove). Block 0 (r < 64) is untouched, so sf1
  outputs are bit-identical to the pre-mask generator and earlier
  sweep rows stay comparable.

An optional 4th arg regenerates a subset of tables in place
(comma-separated names), for rebuilding one table of an existing dir.

region/nation are fixed dimensions and are copied as-is.
"""
import sys, os, shutil
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graftdata/sf1"
n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.sql(f"SET threads TO {os.cpu_count()}")

# key spaces (all >> max key in sf0.1; doc shift stays clear of the
# +1_000_000 perturbed-copy band the llm corpus() helper adds)
OK, CK, SK, PK, DK, EK, VK = (10**7, 10**6, 10**5, 10**6, 10**7, 10**7, 10**6)

def gen(table, sql):
    if only is not None and table not in only:
        return
    out = f"{dst}/{table}.parquet"
    # In-place rebuilds (the documented 4th-arg use) must clear the
    # prior target first: DuckDB's COPY will not replace an existing
    # single-file parquet with a PER_THREAD_OUTPUT directory or vice
    # versa (r15 ADVICE).
    if os.path.isdir(out):
        shutil.rmtree(out)
    elif os.path.exists(out):
        os.remove(out)
    if os.environ.get("GEN_SFN_PER_THREAD"):
        # Parallel writer for the BIG fact tables of a perf-only sweep
        # dir: a single-file COPY is one writer thread and buffers tens
        # of GB before flushing (the x1000 lineitem COPY sat 20+ min at
        # loadavg 1 with a 17 GB RSS and 0 bytes on disk). With
        # PER_THREAD_OUTPUT the target becomes a DIRECTORY of part
        # files — Spark reads it identically (and ops.ShuffleWidth
        # walks it), but a plain DuckDB read needs a glob, so keep
        # single-file mode (the default) for any dir oracles will read.
        con.sql(f"COPY ({sql}) TO '{out}' "
                "(FORMAT PARQUET, PER_THREAD_OUTPUT TRUE)")
        rows = con.sql(f"SELECT count(*) FROM '{out}/*.parquet'").fetchone()[0]
    else:
        con.sql(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        rows = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{table:12s} {rows:>10,} rows -> {out}")

R = f"range({n}) t(r)"

for tbl in ("region", "nation"):
    gen(tbl, f"SELECT * FROM '{src}/{tbl}.parquet'")

gen("customer", f"""
  SELECT c_custkey + r*{CK} AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM '{src}/customer.parquet', {R}""")

gen("supplier", f"""
  SELECT s_suppkey + r*{SK} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{src}/supplier.parquet', {R}""")

gen("part", f"""
  SELECT p_partkey + r*{PK} AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  FROM '{src}/part.parquet', {R}""")

gen("orders", f"""
  SELECT o_orderkey + r*{OK} AS o_orderkey, o_custkey + r*{CK} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}/orders.parquet', {R}""")

gen("lineitem", f"""
  SELECT l_orderkey + r*{OK} AS l_orderkey, l_partkey + r*{PK} AS l_partkey,
         l_suppkey + r*{SK} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM '{src}/lineitem.parquet', {R}""")

gen("events", f"""
  SELECT event_id + r*{EK} AS event_id, ts, user_id + r*{CK} AS user_id,
         event_type, value, props
  FROM '{src}/events.parquet', {R}""")

gen("documents", f"""
  SELECT doc_id, text, lang, source,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM (
    SELECT doc_id + r*{DK} AS doc_id,
           CASE WHEN r = 0 THEN text
                ELSE array_to_string(
                  [CAST(r AS VARCHAR) || w FOR w IN string_split(text, ' ')], ' ')
           END AS text,
           lang, source
    FROM '{src}/documents.parquet', {R})""")

gen("embeddings", f"""
  SELECT vec_id,
         CASE WHEN blk = 0 THEN rolled
              ELSE list_transform(generate_series(1, len(rolled)),
                     i -> rolled[i] * (CASE WHEN hash(blk, i) % 2 = 0
                                       THEN 1 ELSE -1 END))
         END::FLOAT[] AS embedding,
         label
  FROM (
    SELECT vec_id + r*{VK} AS vec_id, r // len(embedding) AS blk,
           (embedding[(r % len(embedding)) + 1:]
            || embedding[1:(r % len(embedding))])::FLOAT[] AS rolled,
           label
    FROM '{src}/embeddings.parquet', {R})""")

print("done")
