package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located joins via bucketing (builder brief: "bucketing for
  * co-located joins"). Writing both sides of a recurring join bucketed
  * and sorted on the join key removes the per-query shuffle AND the
  * per-query sort: the sort-merge join reads pre-organized buckets.
  * The right layout for the fact-fact joins a 100 TB deployment
  * re-runs constantly (stop_times ⋈ trips, lineitem ⋈ orders).
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted external table. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two equally-bucketed tables on their bucket key — planned as
    * a shuffle-free (and sort-free) sort-merge join. */
  def bucketJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
