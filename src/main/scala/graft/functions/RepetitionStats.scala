package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document 3-gram repetition statistics:
  * `repetition_stats(words)` = `struct(n_shingles, n_distinct,
  * max_freq)` over the document's consecutive 3-token shingles —
  * the whole per-doc frequency profile the Gopher/MassiveText
  * repetition gate (`llm_repetition_filter`) needs, in ONE codegen'd
  * pass with NO shuffle.
  *
  * What it replaces (the r12–r16 formulation, kept verbatim as the
  * executable spec in RepetitionStatsSpec): explode every shingle
  * STRING into instance rows, hash-partition them by doc_id, then two
  * aggregations (per-(doc,shingle) counts, per-doc max/sum/count).
  * That plan materializes and exchanges one string row per shingle —
  * at sf1 it ran 5.4× the DuckDB oracle (r16 VERDICT "What's wrong"
  * #2) purely on instance-stream volume, and at 100 TB the exchange
  * ships the whole corpus re-rendered as shingles. But the statistics
  * are PER-DOCUMENT: no cross-row information is needed, so the
  * aggregation hierarchy collapses into a per-row expression with a
  * document-bounded hash map — scan → project, embarrassingly
  * parallel, zero exchange. Same cure as [[NgramHashesExpr]] (r10)
  * and [[MinhashBandKeysExpr]] (r16): fuse the interpreted
  * multi-pass pipeline into one generated call.
  *
  * Exactness contract (what the spec pins element-wise against the
  * explode+groupBy form):
  *   - shingle i (0-based) = `words[i] ⧺ ' ' ⧺ words[i+1] ⧺ ' ' ⧺
  *     words[i+2]` for i in 0..len-3 — the oracle's 1-based
  *     `toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]`;
  *   - distinctness is by exact shingle BYTES (UTF8String equality,
  *     never a hash sketch), so `n_distinct` cannot collide;
  *   - a shingle containing a NULL word is NULL (`concat`/`||`
  *     semantics) and groups under the NULL key. This edge is NEWLY
  *     PINNED here, not inherited: the replaced formulation built
  *     shingles via Winnow.shingles (`concat_ws`, which SKIPS NULL
  *     words), so the two disagree on NULL-word arrays — unreachable
  *     from `split(text, ' ')`, which never yields NULL elements, and
  *     the spec's element-wise identity holds on that reachable
  *     domain. Pinned so the expression is total on arbitrary arrays
  *     (r17 ADVICE; [[BottomKShingleHashes]] keeps concat_ws
  *     semantics because ITS replaced formulation used concat_ws —
  *     each expression pins the exact semantics of the pipeline it
  *     replaced rather than a repo-wide NULL-word convention);
  *   - inputs with fewer than 3 words return NULL (callers filter
  *     `size(toks) >= 3`, the oracle's WHERE — NULL-out keeps the
  *     expression total instead of undefined).
  *
  * Memory bound: the map holds one entry per DISTINCT shingle of ONE
  * document — O(doc length), freed per row; never corpus-scale state.
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects array<string>; got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_shingles", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_freq", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(words: Any): Any = {
    val r = RepetitionStats.stats(words.asInstanceOf[ArrayData])
    if (r == null) null else r
  }

  // stats() returns null for <3-word inputs, so the generated code
  // must re-check isNull after the call (nullable result from a
  // non-null input) — nullSafeCodeGen with an explicit null check
  // instead of defineCodeGen's straight assignment.
  override def nullable: Boolean = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.RepetitionStats.stats($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStats {

  private val Space = UTF8String.fromString(" ")

  /** Called from generated code: one pass over the word array,
    * counting consecutive 3-gram occurrences in a per-document hash
    * map keyed by exact shingle bytes. Returns NULL for arrays with
    * fewer than 3 elements (no shingle exists). */
  def stats(words: ArrayData): InternalRow = {
    val len = words.numElements()
    if (len < 3) return null
    val n = len - 2
    // load-factor headroom so a mostly-distinct doc never rehashes
    val counts = new java.util.HashMap[UTF8String, Array[Int]](n * 2)
    var maxFreq = 0
    var nullFreq = 0 // shingles with a NULL word group under one key
    var i = 0
    while (i < n) {
      if (words.isNullAt(i) || words.isNullAt(i + 1) || words.isNullAt(i + 2)) {
        nullFreq += 1
        if (nullFreq > maxFreq) maxFreq = nullFreq
      } else {
        val sh = UTF8String.concat(words.getUTF8String(i), Space,
          words.getUTF8String(i + 1), Space, words.getUTF8String(i + 2))
        var c = counts.get(sh)
        if (c == null) { c = new Array[Int](1); counts.put(sh, c) }
        c(0) += 1
        if (c(0) > maxFreq) maxFreq = c(0)
      }
      i += 1
    }
    val distinct = counts.size + (if (nullFreq > 0) 1 else 0)
    new GenericInternalRow(Array[Any](n.toLong, distinct.toLong, maxFreq.toLong))
  }

  val builder: Seq[Expression] => Expression = {
    case Seq(words) => RepetitionStatsExpr(words)
    case other => throw new IllegalArgumentException(
      s"usage: repetition_stats(array<string>) — got ${other.mkString(", ")}")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "repetition_stats", builder, "built-in")
}
