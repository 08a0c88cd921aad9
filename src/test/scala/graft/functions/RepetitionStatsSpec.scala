package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused [[RepetitionStatsExpr]] must match the explode+groupBy
  * formulation it replaced (r12–r16 llm_repetition_filter) element-wise
  * — the old three-stage plan is kept HERE verbatim as the executable
  * spec, run on real corpus text plus the adversarial edges of
  * `split`/`concat` semantics (repeated shingles, empty tokens,
  * unicode, exactly-one-shingle docs), plus direct-eval checks for the
  * cases a `split(text, ' ')` source can never produce (NULL words,
  * sub-3-element arrays). */
class RepetitionStatsSpec extends SparkSpec {

  /** The replaced formulation: shingle instance rows → per-(doc,sh)
    * counts → per-doc stats (two aggregations over one exchange). */
  private def composable(docs: DataFrame): DataFrame = {
    val shingles = expr(
      "transform(sequence(1, size(toks) - 2), " +
        "i -> concat(toks[i-1], ' ', toks[i], ' ', toks[i+1]))")
    docs
      .select(col("doc_id"), explode(shingles).as("sh"))
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").cast("long").as("n_shingles"),
        count(lit(1)).as("n_distinct"),
        max("c").as("max_freq"))
  }

  private def fused(docs: DataFrame): DataFrame = {
    RepetitionStats.register(docs.sparkSession)
    docs.select(col("doc_id"), expr("repetition_stats(toks)").as("st"))
      .select(col("doc_id"), col("st.n_shingles").as("n_shingles"),
        col("st.n_distinct").as("n_distinct"),
        col("st.max_freq").as("max_freq"))
  }

  private def assertIdentical(texts: DataFrame): Unit = {
    val docs = texts
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 3)
    val f = fused(docs)
    val c = composable(docs)
    assert(f.exceptAll(c).isEmpty && c.exceptAll(f).isEmpty,
      s"fused != composable:\n fused ${f.orderBy("doc_id").collect().toSeq}" +
        s"\n comp  ${c.orderBy("doc_id").collect().toSeq}")
  }

  test("identical to the explode+groupBy form on real corpus text") {
    assertIdentical(spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(500))
  }

  test("identical on concat/split edge cases") {
    import spark.implicits._
    assertIdentical(Seq(
      "a b c",                                   // exactly one shingle
      "a b c d",                                 // two overlapping shingles
      "x x x x x x",                             // maximally repetitive
      "a b a b a b a b",                         // period-2 repetition
      "a  b  c",                                 // empty tokens from double spaces
      "a b c ",                                  // trailing empty token
      "héllo wörld ñ über ß é",                  // multi-byte UTF-8
      (1 to 500).map(i => s"w${i % 7}").mkString(" "), // long, few distinct
      (1 to 500).map(i => s"u$i").mkString(" ")) // long, all distinct
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
  }

  test("NULL words group under one key; <3 words is NULL") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ws: String*): GenericArrayData =
      new GenericArrayData(ws.map(w =>
        if (w == null) null else UTF8String.fromString(w)).toArray[Any])
    // [a, NULL, b, NULL, c]: shingles (a,_,b) (_,b,_) (b,_,c) all
    // contain a NULL word -> one NULL key with count 3, like the
    // groupBy over exploded NULL shingles
    val r = RepetitionStats.stats(arr("a", null, "b", null, "c"))
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L && r.getLong(2) == 3L)
    // mixed: [a, b, c, NULL, a, b, c] -> shingles: "a b c", "b c NULL"->null,
    // "c NULL a"->null, "NULL a b"->null, "a b c" -> n=5, distinct=2, max=3
    val m = RepetitionStats.stats(arr("a", "b", "c", null, "a", "b", "c"))
    assert(m.getLong(0) == 5L && m.getLong(1) == 2L && m.getLong(2) == 3L)
    assert(RepetitionStats.stats(arr()) == null)
    assert(RepetitionStats.stats(arr("a")) == null)
    assert(RepetitionStats.stats(arr("a", "b")) == null)
  }

  test("the fused plan has no exchange (map-only)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val plan = fused(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }
}
