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
    q.Views.defs,
    q.Clean.defs,
    q.LlmOps.defs,
    q.GeoOps.defs,
    q.Events.defs,
    q.Warehouse.defs,
  )

  private lazy val defs: Map[String, QueryDef] = {
    val total = families.map(_.size).sum
    val merged = families.foldLeft(Map.empty[String, QueryDef])(_ ++ _)
    require(merged.size == total,
      s"duplicate query names across families: ${total - merged.size} shadowed")
    merged
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core consumer view: the arrivals/departures star join
    * (SURVEY.md §2.7 V2) re-expressed over the TPC-H-ish tables —
    * fact ⋈ broadcast dims + grouped stats. Only the bounded dims
    * (nation, region — fixed cardinality at any SF) are broadcast;
    * customer scales with SF, so its join is left to AQE.
    */
  def entry(spark: SparkSession): DataFrame =
    q.Views.v2Entry(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (k, v) => k -> v.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case (k, v) if v.oracle.isDefined => k -> v.oracle.get }
}
