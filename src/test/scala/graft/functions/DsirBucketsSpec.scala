package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused [[DsirBucketHistExpr]] must reproduce the per-(doc,
  * bucket) instance counts of the explode+hash formulation it replaced
  * (r12–r17 llm_dsir_weights, kept HERE verbatim as the executable
  * spec — the sha256_chunks 60-bit parse mod 64, which the DuckDB
  * oracle's '0x' || substr(sha256(sh), 1, 15) replays). */
class DsirBucketsSpec extends SparkSpec {

  private val B = 64

  /** The replaced formulation: bigram instance rows → 60-bit sha
    * prefix → bucket, counted per (doc_id, b). */
  private def composable(docs: DataFrame): DataFrame = {
    Sha256Chunks.register(docs.sparkSession)
    val hv = expr(
      "shiftleft(element_at(sha256_chunks(sh), 1), 28) + " +
        "shiftright(element_at(sha256_chunks(sh), 2), 4)")
    docs
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> " +
          "concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")).as("sh"))
      .select(col("doc_id"), pmod(hv, lit(B.toLong)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
  }

  private def fused(docs: DataFrame): DataFrame = {
    DsirBuckets.register(docs.sparkSession)
    docs
      .select(col("doc_id"),
        expr(s"dsir_bucket_hist(toks, $B)").as("hist"))
      .where(col("hist").isNotNull)
      .select(col("doc_id"), posexplode(col("hist")).as(Seq("b", "c")))
      .where(col("c") > 0)
      .select(col("doc_id"), col("b").cast("long").as("b"), col("c"))
  }

  private def assertIdentical(texts: DataFrame): Unit = {
    val docs = texts.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val f = fused(docs)
    val c = composable(docs)
    assert(f.exceptAll(c).isEmpty && c.exceptAll(f).isEmpty,
      s"fused != composable:\n fused ${f.orderBy("doc_id", "b").collect().take(20).toSeq}" +
        s"\n comp  ${c.orderBy("doc_id", "b").collect().take(20).toSeq}")
  }

  test("identical to the explode+hash form on real corpus text") {
    assertIdentical(spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(500))
  }

  test("identical on split/concat edge cases") {
    import spark.implicits._
    assertIdentical(Seq(
      "a b",                                    // one bigram
      "a b a b a b",                            // repeats into one bucket
      "a  b  c",                                // empty tokens
      "héllo wörld ñ über",                     // multi-byte UTF-8
      (1 to 400).map(i => s"w${i % 9}").mkString(" "),
      (1 to 400).map(i => s"u$i").mkString(" "))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
  }

  test("NULL-word bigrams are skipped; <2 words is NULL; Σ = counted bigrams") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ws: String*): GenericArrayData =
      new GenericArrayData(ws.map(w =>
        if (w == null) null else UTF8String.fromString(w)).toArray[Any])
    // [a, NULL, b, c]: bigrams (a,_) (_,b) skipped, (b,c) counted
    val r = DsirBuckets.hist(arr("a", null, "b", "c"), B)
    val total = (0 until r.numElements()).map(r.getLong).sum
    assert(total == 1L)
    assert(DsirBuckets.hist(arr("a"), B) == null)
    val full = DsirBuckets.hist(arr("a", "b", "c"), B)
    assert((0 until full.numElements()).map(full.getLong).sum == 2L)
  }
}
