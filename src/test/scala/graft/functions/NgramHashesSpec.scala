package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native ngram_hashes expression: set-semantics agreement with the
  * composable HOF formulation (same DISTINCT-gram cardinality and
  * cross-doc sharing structure), edge cases, determinism. The hash
  * VALUES intentionally differ from xxhash64-of-joined-string (chained
  * word hashes, no separator string build), so equivalence is asserted
  * on the properties queries consume: per-doc distinct-gram count and
  * the gram-key partition across docs. */
class NgramHashesSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c d e f g h i j"),          // 3 grams of 8, all distinct
    (2L, "a b c d e f g h i j"),          // identical doc → same 3 grams
    (3L, "x a b c d e f g h i j"),        // shares doc-1 grams shifted in
    (4L, "a b c d e f g"),                // 7 words → no gram
    (5L, ""),                             // empty
    (6L, "w w w w w w w w w w w w")       // repeated word → 1 distinct gram
  ).toDF("doc_id", "text")

  test("matches the HOF formulation's distinct-gram counts per doc") {
    NgramHashes.register(spark)
    val native = docs
      .select(col("doc_id"), size(expr("ngram_hashes(split(text, ' '), 8)")).as("n"))
      .as[(Long, Int)].collect().toMap
    val ws = split(col("text"), " ")
    val hof = docs.where(size(ws) >= 8)
      .select(col("doc_id"), size(array_distinct(transform(
        sequence(lit(0), size(ws) - 8),
        i => xxhash64(array_join(slice(ws, i + 1, lit(8)), " "))))).as("n"))
      .as[(Long, Int)].collect().toMap
    // the HOF form needs the size guard (sequence(0, negative) throws);
    // native yields 0 for short docs — assert that explicitly
    assert(native(1L) == 3 && native(2L) == 3 && native(3L) == 4)
    assert(native(4L) == 0 && native(6L) == 1)
    for (id <- Seq(1L, 2L, 3L, 6L)) assert(native(id) == hof(id), s"doc $id")
  }

  test("identical word sequences share gram keys; different ones do not") {
    NgramHashes.register(spark)
    val g = docs.select(col("doc_id"),
        explode(expr("ngram_hashes(split(text, ' '), 8)")).as("gh"))
      .groupBy("gh").agg(collect_set("doc_id").as("ds"))
      .select(col("ds")).as[Seq[Long]].collect()
    // docs 1 and 2 are identical → every gram of doc 1 is shared with 2;
    // doc 3 contains the same 8-grams (suffix windows) → 3 of its 4
    // grams are shared; doc 6's gram is unique
    assert(g.count(s => s.sorted == Seq(1L, 2L, 3L)) == 3)
    assert(g.count(s => s.sorted == Seq(3L)) == 1)
    assert(g.count(s => s.sorted == Seq(6L)) == 1)
  }

  test("output is sorted distinct and deterministic across evaluations") {
    NgramHashes.register(spark)
    val a = docs.select(col("doc_id"), expr("ngram_hashes(split(text, ' '), 8)").as("g"))
      .as[(Long, Seq[Long])].collect().toMap
    val b = docs.select(col("doc_id"), expr("ngram_hashes(split(text, ' '), 8)").as("g"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(a == b)
    a.values.foreach { g =>
      assert(g == g.sorted, "sorted")
      assert(g.distinct == g, "distinct")
    }
  }

  test("n=1 hashes every distinct word") {
    NgramHashes.register(spark)
    val n = Seq((1L, "p q r p q")).toDF("doc_id", "text")
      .select(size(expr("ngram_hashes(split(text, ' '), 1)")).as("n"))
      .as[Int].head()
    assert(n == 3)
  }

  test("rejects non-literal or wrong-typed arguments") {
    NgramHashes.register(spark)
    intercept[Exception] {
      docs.select(expr("ngram_hashes(split(text, ' '), doc_id)")).collect()
    }
    intercept[Exception] {
      docs.select(expr("ngram_hashes(text, 8)")).collect()
    }
  }
}
