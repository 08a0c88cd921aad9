package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.QueryDef
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query families live in `graft.queries.*`; each entry pairs a Spark
  * plan with a DuckDB-equivalent oracle SQL (where SQL-expressible).
  */
object SparkEntry {

  private lazy val families: Seq[Map[String, QueryDef]] = Seq(
    q.Bookkeeping.defs,
  )

  private lazy val defs: Map[String, QueryDef] =
    families.reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core consumer view: the arrivals/departures star join
    * (SURVEY.md §2.7 V2) re-expressed over the TPC-H-ish tables —
    * fact ⋈ broadcast dims + grouped stats.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    val r = Tables.region(spark, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "o_orderstatus")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("revenue_cents"))
      .orderBy("r_name", "o_orderstatus")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (k, v) => k -> v.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case (k, v) if v.oracle.isDefined => k -> v.oracle.get }
}
