package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** sorted_intersect_count: the merge-walk must agree with
  * size(array_intersect(...)) on every sorted-distinct input, including
  * the empties and no-overlap cases, and compose with ngram_hashes (its
  * intended producer). */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  test("agrees with size(array_intersect) on sorted distinct arrays") {
    SortedIntersect.register(spark)
    val rows = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L)),   // partial overlap
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),             // identical
      (Seq(1L, 2L), Seq(3L, 4L)),                     // disjoint
      (Seq.empty[Long], Seq(1L, 2L)),                 // empty left
      (Seq.empty[Long], Seq.empty[Long]),             // both empty
      (Seq(Long.MinValue, 0L, Long.MaxValue),
        Seq(Long.MinValue, Long.MaxValue))            // extremes
    ).toDF("a", "b")
    val got = rows.select(
      expr("sorted_intersect_count(a, b)").as("n"),
      size(array_intersect(col("a"), col("b"))).as("want"))
      .as[(Int, Int)].collect()
    got.foreach { case (n, want) => assert(n == want, s"got $n want $want") }
  }

  test("null inputs propagate; composes with ngram_hashes") {
    SortedIntersect.register(spark)
    NgramHashes.register(spark)
    val nulls = Seq((Some(Seq(1L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .select(expr("sorted_intersect_count(a, b)"))
    assert(nulls.collect().head.isNullAt(0))
    // two docs sharing exactly the 3-shingles of the common suffix:
    // "b c d e" has shingles {bcd, cde}; both appear in each doc
    val docs = Seq(("a b c d e", "z b c d e")).toDF("ta", "tb")
      .select(expr(
        "sorted_intersect_count(ngram_hashes(split(ta, ' '), 3), " +
          "ngram_hashes(split(tb, ' '), 3))").as("n"))
      .as[Int].collect()
    assert(docs.head == 2, s"got ${docs.head}")
  }

  test("rejects non-long arrays at analysis") {
    SortedIntersect.register(spark)
    val bad = Seq((Seq("x"), Seq("x"))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(expr("sorted_intersect_count(a, b)")).collect()
    }
    assert(e.getMessage.contains("sorted_intersect_count") ||
      e.getMessage.toLowerCase.contains("data type"), e.getMessage)
  }
}
