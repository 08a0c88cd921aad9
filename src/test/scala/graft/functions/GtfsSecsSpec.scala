package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native gtfs_secs expression: parser unit cases, SQL registration,
  * agreement with the composable-column implementation, codegen. */
class GtfsSecsSpec extends SparkSpec {
  import spark.implicits._

  private def p(s: String): java.lang.Long = GtfsSecs.parse(UTF8String.fromString(s))

  test("byte parser handles plain, >24h, one-digit-hour and malformed input") {
    assert(p("08:00:00") == 8 * 3600L)
    assert(p("25:10:30") == 25 * 3600L + 630)
    assert(p("7:05:09") == 7 * 3600L + 309)
    assert(p("123:00:00") == 123 * 3600L)
    assert(p("") == null)
    assert(p("8:0:0") == null)       // MM/SS must be two digits
    assert(p("08:61:00") == null)    // minutes > 59
    assert(p("08:00") == null)
    assert(p("ab:cd:ef") == null)
    assert(p("08:00:00x") == null)
  }

  test("registered SQL function matches GtfsTime.toSeconds on real data") {
    GtfsSecs.register(spark)
    val times = Seq("08:00:00", "25:10:00", "7:05:09", "47:59:59")
      .toDF("t")
    val out = times.select(
      expr("gtfs_secs(t)").as("native"),
      graft.gtfs.GtfsTime.toSeconds(col("t")).as("composed"))
      .as[(Long, Long)].collect()
    out.foreach { case (n, c) => assert(n == c) }
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    GtfsSecs.register(spark)
    // non-foldable input (range-derived) so the expression cannot be
    // constant-folded away and must run inside generated code
    val df = spark.range(10)
      .selectExpr("concat('0', cast(id as string), ':00:00') AS t")
      .selectExpr("gtfs_secs(t) AS s")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), s"plan:\n$plan")
    assert(df.as[Long].collect().toSeq == (0 until 10).map(_ * 3600L))
  }

  test("malformed input yields NULL through the SQL surface") {
    GtfsSecs.register(spark)
    val out = Seq("bogus", "08:00:00").toDF("t")
      .selectExpr("gtfs_secs(t) AS s").as[Option[Long]].collect().toSet
    assert(out == Set(None, Some(28800L)))
  }
}
