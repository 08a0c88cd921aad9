package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BottomKDistinct against brute force, plus the bounded-buffer
  * invariants the scaladoc promises. */
class BottomKSpec extends SparkSpec {
  import spark.implicits._

  test("property: equals sorted-distinct-take-k across random groups") {
    val rnd = new scala.util.Random(19)
    (1 to 6).foreach { case_i =>
      val k = 1 + rnd.nextInt(4)
      val rows = (0 until 200).map { _ =>
        (rnd.nextInt(5).toLong, f"v${rnd.nextInt(30)}%03d")
      }
      val want = rows.groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.sorted.take(k)).toMap
      val got = rows.toDF("g", "v")
        .groupBy("g").agg(BottomK.bottomKDistinct(col("v"), k).as("bk"))
        .as[(Long, Seq[String])].collect().toMap
      assert(got == want, s"case $case_i k=$k")
    }
  }

  test("nulls are skipped; fewer than k values yield all of them") {
    val got = Seq((1L, Some("b")), (1L, None), (1L, Some("a")), (2L, None))
      .toDF("g", "v")
      .groupBy("g").agg(BottomK.bottomKDistinct(col("v"), 5).as("bk"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("a", "b"))
    assert(got(2L) == Seq.empty)
  }

  test("merge keeps the bound: buffers never exceed k (unit-level)") {
    val agg = BottomKDistinct(3)
    val b1 = Seq("d", "b", "f", "a", "e").foldLeft(agg.zero)(agg.reduce)
    val b2 = Seq("c", "a", "g").foldLeft(agg.zero)(agg.reduce)
    assert(b1.length <= 3 && b2.length <= 3)
    val m = agg.merge(b1, b2)
    assert(m.length <= 3)
    assert(agg.finish(m) == Seq("a", "b", "c"))
  }

  test("plans as the same ObjectHashAggregate shape as collect_set") {
    val df = Seq((1L, "x")).toDF("g", "v")
      .groupBy("g").agg(BottomK.bottomKDistinct(col("v"), 3))
    assert(df.queryExecution.executedPlan.toString
      .contains("ObjectHashAggregate"))
  }
}
