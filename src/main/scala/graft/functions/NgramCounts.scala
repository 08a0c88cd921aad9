package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document n-gram frequency table:
  * `ngram_counts(words, n)` = `array<struct<sh, cnt>>` — one entry per
  * DISTINCT consecutive n-token shingle of the document with its
  * occurrence count, in first-occurrence order — in ONE codegen'd pass
  * with NO shuffle.
  *
  * Why it exists (r17 VERDICT "Next" #2/#5): four queries
  * (`llm_boilerplate`, `llm_vocab_growth`, `llm_inverted_index`, the
  * frequent-set build behind the streaming boilerplate scorer) each
  * rendered the corpus as one string row per n-gram INSTANCE and let
  * aggregation dedup it later — `explode(transform(sequence(...)))`
  * followed by `groupBy`. The instances-per-document profile is
  * strictly PER-ROW information: fusing it means every downstream
  * consumer starts from doc-distinct `(sh, cnt)` entries — strictly
  * fewer rows than instances, with the per-doc counts already folded —
  * so document-frequency aggregations shuffle doc-distinct pairs and
  * per-doc totals come from `cnt` sums, never from re-counting
  * instances. Same collapse as [[RepetitionStatsExpr]] (which keeps
  * only the 3-gram summary stats; this keeps the full table for
  * consumers that need the shingles themselves).
  *
  * Exactness contract (NgramCountsSpec pins element-wise against the
  * explode+groupBy formulation):
  *   - shingle i (0-based) = words i..i+n-1 joined by single spaces
  *     with `concat` semantics — a NULL word makes the WHOLE shingle
  *     NULL, matching the `concat(toks[i], ' ', toks[i+1])` column the
  *     explode formulations built (unreachable from `split(text, ' ')`,
  *     pinned for arbitrary arrays; all NULL shingles fold into one
  *     entry with `sh = NULL`, as exploded NULL rows grouped);
  *   - distinctness is by exact shingle BYTES (UTF8String equality);
  *   - counts are exact occurrence counts; Σ cnt = len − n + 1;
  *   - entry order is first-occurrence (deterministic in the input);
  *   - fewer than n words → NULL (the explode formulations' WHERE
  *     `size(toks) >= n`: no shingle exists).
  *
  * Memory bound: one entry per distinct shingle of ONE document —
  * O(doc length), freed per row; never corpus-scale state.
  */
case class NgramCountsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_counts expects (array<string>, n >= 1); got " +
        s"(${other.catalogString}, $n)")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sh", StringType, nullable = true),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "ngram_counts"
  override def nullable: Boolean = true

  override def nullSafeEval(words: Any): Any =
    NgramCounts.counts(words.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.NgramCounts.counts($c, $n);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NgramCountsExpr =
    copy(child = newChild)
}

object NgramCounts {

  private val Space = UTF8String.fromString(" ")

  /** Called from generated code: one pass over the word array, counting
    * consecutive n-gram occurrences in a per-document insertion-ordered
    * map keyed by exact shingle bytes (LinkedHashMap permits the one
    * NULL key the NULL-shingle entry needs). Returns NULL for arrays
    * with fewer than n elements. */
  def counts(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n) return null
    val m = len - n + 1
    val counts =
      new java.util.LinkedHashMap[UTF8String, Array[Long]](m * 2)
    var i = 0
    while (i < m) {
      var hasNull = false
      var j = i
      while (j < i + n) {
        if (words.isNullAt(j)) hasNull = true
        j += 1
      }
      val sh: UTF8String =
        if (hasNull) null
        else if (n == 1) words.getUTF8String(i)
        else {
          val parts = new Array[UTF8String](2 * n - 1)
          var p = 0
          var q = i
          while (q < i + n) {
            if (p > 0) parts(p - 1) = Space
            parts(p) = words.getUTF8String(q)
            p += 2
            q += 1
          }
          UTF8String.concat(parts: _*)
        }
      var c = counts.get(sh)
      if (c == null) { c = new Array[Long](1); counts.put(sh, c) }
      c(0) += 1
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      o += 1
    }
    new GenericArrayData(out)
  }

  val builder: Seq[Expression] => Expression = {
    case Seq(words, Literal(n: Int, _)) => NgramCountsExpr(words, n)
    case other => throw new IllegalArgumentException(
      "usage: ngram_counts(array<string>, n) with literal int n — got " +
        other.mkString(", "))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_counts", builder, "built-in")
}
