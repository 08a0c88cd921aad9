package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Bookkeeping-layer operators of the reference (SURVEY.md §2.1 S4/S5,
  * §2.3 P1-P6, §2.6 H1-H4, §2.8 sort/limit/top-k, T4 retention),
  * demonstrated over the driver's test tables:
  * `orders` stands in for `latest_successful_imports`
  * (reference: /root/reference/index.js:155-161) and `customer` for the
  * pg_database catalog (/root/reference/index.js:205-221).
  */
object Bookkeeping {

  val defs: Map[String, QueryDef] = Map(

    // S4 + P1 + P2 + H1 + H4 + sort: the recorded-imports scan.
    // db_name = <prefix><unixSeconds>_<digest6>  (index.js:55-62)
    // projection + prefix predicate + ORDER BY imported_at DESC (index.js:183-198)
    "s4_meta_scan" -> QueryDef(
      doc = "bookkeeping scan: project, prefix-filter, digest-derived name, sort desc",
      oracle = """
        |SELECT 'gtfs_' || CAST(CAST(floor(epoch(o_orderdate)) AS BIGINT) AS VARCHAR)
        |         || '_' || substr(sha256(o_orderpriority), 1, 6) AS db_name,
        |       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS imported_at,
        |       substr(sha256(o_orderpriority), 1, 6) AS feed_digest,
        |       o_orderkey
        |FROM orders
        |WHERE o_orderpriority LIKE '1-%'
        |ORDER BY imported_at DESC, o_orderkey DESC
        |LIMIT 100
        |""") { (s, d) =>
      val ts = epochS(col("o_orderdate"))
      val digest = substring(sha2(col("o_orderpriority"), 256), 1, 6)
      Tables.orders(s, d)
        .where(col("o_orderpriority").startsWith("1-"))
        .select(
          concat(lit("gtfs_"), ts.cast("string"), lit("_"), digest).as("db_name"),
          ts.as("imported_at"),
          digest.as("feed_digest"),
          col("o_orderkey"))
        .orderBy(desc("imported_at"), desc("o_orderkey"))
        .limit(100)
    },

    // S5 + P2 + P4: catalog scan ORDER BY name ASC with self-exclusion
    // (index.js:205-221; the meta DB itself is dropped at index.js:220).
    "s5_catalog_scan" -> QueryDef(
      doc = "catalog scan: prefix filter, exclude the meta db, sort asc",
      oracle = """
        |SELECT c_name AS db_name, c_custkey
        |FROM customer
        |WHERE c_name LIKE 'Customer#%' AND c_name <> 'Customer#000000000'
        |ORDER BY db_name ASC, c_custkey ASC
        |LIMIT 200
        |""") { (s, d) =>
      Tables.customer(s, d)
        .where(col("c_name").startsWith("Customer#") &&
          col("c_name") =!= "Customer#000000000")
        .select(col("c_name").as("db_name"), col("c_custkey"))
        .orderBy(asc("db_name"), asc("c_custkey"))
        .limit(200)
    },

    // P3: dangling-pointer reconciliation — recorded imports whose DB
    // still exists (left semi, import.js:149-158); grouped tally.
    "p3_dangling_semi" -> QueryDef(
      doc = "left-semi join: recorded imports whose target still exists",
      oracle = """
        |SELECT o_orderstatus, count(*) AS n_live
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus
        |""") { (s, d) =>
      val live = Tables.customer(s, d).where(col("c_acctbal") > 5000)
      Tables.orders(s, d)
        .join(live, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n_live"))
    },

    // P3 complement / T4 victim selection: allDbs ∖ retained (left anti,
    // import.js:166-169).
    "p4_anti_orphans" -> QueryDef(
      doc = "left-anti join: catalog entries with no recorded import",
      oracle = """
        |SELECT c_custkey, c_name
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey
        |LIMIT 200
        |""") { (s, d) =>
      val recorded = Tables.orders(s, d).where(col("o_orderstatus") === "O")
      Tables.customer(s, d)
        .join(recorded, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .limit(200)
    },

    // T4: retention policy — newest-2 per prefix group
    // (determineDbsToRetain, import.js:71-73).
    "t4_retention_top2" -> QueryDef(
      doc = "ranking window: keep newest 2 imports per group",
      oracle = """
        |SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(floor(epoch(o_orderdate)) AS BIGINT) AS imported_at,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |WHERE rn <= 2
        |ORDER BY o_custkey, rn
        |""") { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_orderdate"), desc("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          epochS(col("o_orderdate")).as("imported_at"),
          row_number().over(w).as("rn"))
        .where(col("rn") <= 2)
    },

    // P5 + H3: skip-if-unchanged — an import whose digest equals the
    // previous import's digest is skipped (import.js:235-239).
    "p5_skip_unchanged" -> QueryDef(
      doc = "lag window + digest equality: importSkipped detection",
      oracle = """
        |SELECT o_custkey,
        |       count(*) AS n_imports,
        |       count(*) FILTER (WHERE feed_digest = prev_digest) AS n_skipped
        |FROM (
        |  SELECT o_custkey,
        |         substr(sha256(o_orderpriority), 1, 6) AS feed_digest,
        |         lag(substr(sha256(o_orderpriority), 1, 6))
        |           OVER (PARTITION BY o_custkey
        |                 ORDER BY o_orderdate, o_orderkey) AS prev_digest
        |  FROM orders)
        |GROUP BY o_custkey
        |ORDER BY o_custkey
        |""") { (s, d) =>
      val digest = substring(sha2(col("o_orderpriority"), 256), 1, 6)
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d)
        .select(col("o_custkey"), digest.as("feed_digest"),
          lag(digest, 1).over(w).as("prev_digest"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_imports"),
          count(when(col("feed_digest") === col("prev_digest"), 1)).as("n_skipped"))
    },

    // H3: composite digest — digest of the ordered concatenation of
    // member digests; listing order matters (import.js:200-227).
    "h3_composite_digest" -> QueryDef(
      doc = "order-sensitive composite digest per group",
      oracle = """
        |SELECT o_custkey,
        |       substr(sha256(string_agg(d, '' ORDER BY o_orderkey)), 1, 6) AS feed_digest,
        |       count(*) AS n_parts
        |FROM (
        |  SELECT o_custkey, o_orderkey,
        |         substr(sha256(o_orderpriority || CAST(o_orderkey AS VARCHAR)), 1, 6) AS d
        |  FROM orders)
        |GROUP BY o_custkey
        |ORDER BY o_custkey
        |""") { (s, d) =>
      // r19 (r18 VERDICT #3): the original `collect_list + array_sort +
      // sha2(array_join)` held every group's member digests in executor
      // memory — unbounded per-key state on a hot customer key, the
      // exact scale-killer ops.OrderedDigest was written for (its
      // header cites THIS query as the motivating case; c14/c16
      // migrated in r18, h3 never did). The streaming digest computes
      // the same sha256-of-ordered-concat with O(1) per-key state: the
      // oracle's `string_agg(d, '' ORDER BY o_orderkey)` is exactly the
      // digest's determinism contract (o_orderkey is unique per row, a
      // total order), and the exchange narrows to the three typed
      // source columns with the member-digest render above it.
      val part = substring(
        sha2(concat(col("o_orderpriority"), col("o_orderkey").cast("string")), 256), 1, 6)
      graft.ops.OrderedDigest.perKeyDigest(
          Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_orderpriority"),
          "o_custkey", Seq("o_orderkey"), part, sep = "", takeChars = 6)
        .select(col("o_custkey"), col("digest").as("feed_digest"),
          col("n").as("n_parts"))
    },
  )
}
