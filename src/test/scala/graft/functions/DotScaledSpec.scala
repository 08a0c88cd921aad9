package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native dot_scaled expression: agreement with the higher-order-
  * function formulation, codegen participation, null/length handling. */
class DotScaledSpec extends SparkSpec {
  import spark.implicits._

  test("matches the aggregate(zip_with(...)) formulation on random vectors") {
    DotScaled.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat() - 0.5f),
      Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      expr("dot_scaled(a, b)").as("native"),
      aggregate(
        zip_with(col("a"), col("b"), (x, y) =>
          floor(x.cast("double") * 1000000 + 0.5).cast("long") *
            floor(y.cast("double") * 1000000 + 0.5).cast("long")),
        lit(0L), (acc, v) => acc + v).as("composed"))
      .as[(Long, Long)].collect()
    out.foreach { case (n, c) => assert(n == c) }
  }

  test("participates in whole-stage codegen over a real scan") {
    DotScaled.register(spark)
    val df = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("dot_scaled(embedding, embedding) AS n2")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), s"plan:\n$plan")
    assert(df.as[Long].head() > 0L, "self dot product is positive")
  }

  test("null array yields NULL") {
    DotScaled.register(spark)
    val out = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b").selectExpr("dot_scaled(a, b) AS d")
      .as[Option[Long]].head()
    assert(out.isEmpty)
  }
}
