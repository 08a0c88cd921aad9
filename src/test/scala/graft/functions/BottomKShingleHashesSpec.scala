package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused [[BottomKShingleHashesExpr]] must match the
  * explode + sha2 + collect_set + array_sort + slice formulation it
  * replaced (r12–r17 llm_fingerprint) — kept HERE verbatim as the
  * executable spec, on real corpus text plus shingle/hex edges
  * (ties, duplicate shingles, fewer-than-k distinct hashes, unicode,
  * NULL words through direct eval). */
class BottomKShingleHashesSpec extends SparkSpec {

  /** The replaced formulation (minus the fanout, irrelevant to
    * values): per-shingle sha2 strings through a set aggregate. */
  private def composable(docs: DataFrame, k: Int): DataFrame = {
    val shingles = transform(
      sequence(lit(1), size(col("toks")) - 2),
      i => concat_ws(" ", element_at(col("toks"), i),
        element_at(col("toks"), i + 1), element_at(col("toks"), i + 2)))
    docs.select(col("doc_id"), explode(shingles).as("sh"))
      .groupBy("doc_id")
      .agg(array_join(slice(array_sort(
        collect_set(substring(sha2(col("sh"), 256), 1, 12))), 1, k), "-")
        .as("fingerprint"))
  }

  private def fused(docs: DataFrame, k: Int): DataFrame = {
    BottomKShingleHashes.register(docs.sparkSession)
    docs.select(col("doc_id"),
      expr(s"bottomk_shingle_hashes(toks, $k)").as("fingerprint"))
  }

  private def assertIdentical(texts: DataFrame, k: Int = 3): Unit = {
    val docs = texts
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 3)
    val f = fused(docs, k)
    val c = composable(docs, k)
    assert(f.exceptAll(c).isEmpty && c.exceptAll(f).isEmpty,
      s"fused != composable (k=$k):\n fused ${f.orderBy("doc_id").collect().toSeq}" +
        s"\n comp  ${c.orderBy("doc_id").collect().toSeq}")
  }

  test("identical to the explode+collect_set form on real corpus text") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(500)
    assertIdentical(docs)
    assertIdentical(docs, k = 1)
    assertIdentical(docs, k = 8)
  }

  test("identical on shingle edges") {
    import spark.implicits._
    assertIdentical(Seq(
      "a b c",                                   // one shingle < k
      "a b c d",                                 // two shingles < k
      "x x x x x x x x",                         // all shingles identical
      "a b a b a b a b",                         // duplicate shingle pairs
      "héllo wörld ñ über ß é",                  // multi-byte UTF-8
      (1 to 400).map(i => s"w${i % 5}").mkString(" "),  // few distinct
      (1 to 400).map(i => s"u$i").mkString(" ")) // many distinct
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
  }

  test("NULL words skip with their delimiter; <3 words is NULL") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ws: String*): GenericArrayData =
      new GenericArrayData(ws.map(w =>
        if (w == null) null else UTF8String.fromString(w)).toArray[Any])
    // concat_ws semantics: shingle (a, NULL, b) hashes as "a b"
    val withNull = BottomKShingleHashes.fingerprint(arr("a", null, "b"), 3)
    val joined = BottomKShingleHashes.fingerprint(arr("a", "b", "b"), 3)
    // "a b" (nulls skipped) vs "a b b": different shingles, both
    // single-shingle docs — equality must hold against the direct
    // sha256 of the joined text instead
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("a b".getBytes("UTF-8")).take(6)
      .map(b => f"${b & 0xff}%02x").mkString
    assert(withNull.toString == expected, s"got $withNull")
    assert(joined != null && joined.toString != expected)
    assert(BottomKShingleHashes.fingerprint(arr(), 3) == null)
    assert(BottomKShingleHashes.fingerprint(arr("a", "b"), 3) == null)
  }

  test("the fused plan has no exchange (map-only)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val plan = fused(docs, 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }
}
