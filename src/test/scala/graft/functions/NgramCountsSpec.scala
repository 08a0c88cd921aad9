package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused [[NgramCountsExpr]] must match the explode+groupBy
  * formulation it replaced (the r12–r17 bigram/token instance builds
  * behind llm_boilerplate / llm_vocab_growth / llm_inverted_index)
  * element-wise — the old instance explode is kept HERE verbatim as
  * the executable spec, run on real corpus text plus the adversarial
  * edges of `split`/`concat` semantics, plus direct-eval checks for
  * the cases a `split(text, ' ')` source can never produce (NULL
  * words, sub-n arrays). */
class NgramCountsSpec extends SparkSpec {

  /** The replaced formulation: n-gram instance rows → per-(doc, sh)
    * counts (one explode + one aggregation over the instance stream).
    * Shingles via `concat` — exactly the column the old
    * bigramInstances/vocab_growth/inverted_index builds used. */
  private def composable(docs: DataFrame, n: Int): DataFrame = {
    val gram = (0 until n).flatMap(j =>
      if (j == 0) Seq(expr(s"toks[i + $j]"))
      else Seq(lit(" "), expr(s"toks[i + $j]")))
    docs
      .select(col("doc_id"), explode(expr(
        s"sequence(0, size(toks) - $n)")).as("i"), col("toks"))
      .select(col("doc_id"), concat(gram: _*).as("sh"))
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("cnt"))
  }

  private def fused(docs: DataFrame, n: Int): DataFrame = {
    NgramCounts.register(docs.sparkSession)
    docs.select(col("doc_id"), expr(s"inline(ngram_counts(toks, $n))"))
  }

  private def assertIdentical(texts: DataFrame, n: Int): Unit = {
    val docs = texts
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= n)
    val f = fused(docs, n)
    val c = composable(docs, n)
    assert(f.exceptAll(c).isEmpty && c.exceptAll(f).isEmpty,
      s"fused != composable at n=$n:\n fused ${f.collect().toSeq.take(30)}" +
        s"\n comp  ${c.collect().toSeq.take(30)}")
  }

  private def corpus = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").limit(500)

  test("bigrams: identical to the instance explode on real corpus text") {
    assertIdentical(corpus, 2)
  }

  test("unigrams: identical to the token explode on real corpus text") {
    assertIdentical(corpus, 1)
  }

  test("identical on concat/split edge cases (n = 1, 2, 3)") {
    import spark.implicits._
    val edges = Seq(
      "a b",                                     // exactly one bigram
      "a b a b a b",                             // repeated bigrams
      "x",                                       // single token
      "a  b  c",                                 // empty tokens from double spaces
      "a b c ",                                  // trailing empty token
      "héllo wörld ñ über ß é",                  // multi-byte UTF-8
      (1 to 400).map(i => s"w${i % 5}").mkString(" "), // long, few distinct
      (1 to 400).map(i => s"u$i").mkString(" ")) // long, all distinct
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    Seq(1, 2, 3).foreach(assertIdentical(edges, _))
  }

  test("entry order is first-occurrence; counts sum to instance count") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ws: String*): GenericArrayData =
      new GenericArrayData(ws.map(w =>
        if (w == null) null else UTF8String.fromString(w)).toArray[Any])
    val r = NgramCounts.counts(arr("b", "a", "b", "a"), 2)
    val entries = (0 until r.numElements()).map { i =>
      val row = r.getStruct(i, 2)
      (if (row.isNullAt(0)) null else row.getUTF8String(0).toString,
        row.getLong(1))
    }
    // instances: "b a", "a b", "b a" — first-occurrence order
    assert(entries == Seq(("b a", 2L), ("a b", 1L)))
    assert(entries.map(_._2).sum == 3L)
  }

  test("NULL words fold into one NULL entry; short arrays are NULL") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ws: String*): GenericArrayData =
      new GenericArrayData(ws.map(w =>
        if (w == null) null else UTF8String.fromString(w)).toArray[Any])
    // [a, NULL, a, NULL]: bigrams (a,_) (_,a) (a,_) — every one has a
    // NULL word -> one NULL-sh entry with count 3 (concat semantics,
    // as the exploded NULL rows grouped)
    val r = NgramCounts.counts(arr("a", null, "a", null), 2)
    assert(r.numElements() == 1)
    val row = r.getStruct(0, 2)
    assert(row.isNullAt(0) && row.getLong(1) == 3L)
    // mixed: [a, a, NULL]: (a,a) then (a,_) -> entries [("a a",1), (NULL,1)]
    val m = NgramCounts.counts(arr("a", "a", null), 2)
    assert(m.numElements() == 2)
    assert(m.getStruct(0, 2).getUTF8String(0).toString == "a a")
    assert(m.getStruct(1, 2).isNullAt(0))
    // fewer than n words -> NULL result (no shingle exists)
    assert(NgramCounts.counts(arr("a"), 2) == null)
    assert(NgramCounts.counts(arr(), 1) == null)
  }
}
