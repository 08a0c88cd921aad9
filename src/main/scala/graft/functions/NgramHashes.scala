package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native word-n-gram fingerprints: `ngram_hashes(words, n)` = the
  * DISTINCT 64-bit hashes of every n consecutive words, sorted.
  *
  * The composable formulation —
  * `array_distinct(transform(sequence(...), i => xxhash64(array_join(
  * slice(words, i+1, n), ' '))))` — is correct but `transform` is a
  * higher-order function: the lambda evaluates interpreted, and every
  * element pays a slice allocation + a joined-string build before the
  * hash even runs. On llm_repeated_ngrams that lambda alone was ~80% of
  * the query's steady time (decomposition probe, sf0.1: 1.6 s of 2.0).
  * This expression is one fused pass per document: each word is
  * xxhash64'd ONCE, each gram chains its n word-hashes through
  * XXH64.hashLong (no allocation, no string build — O(len·n) long ops
  * instead of O(len·n) bytes copied + len string allocs), and dedup is
  * an in-place sort instead of array_distinct's per-element set probes.
  *
  * The hash value is INTERNAL to queries (grouping/join keys only —
  * never query output), so it need not match any other engine's hash;
  * oracles compare on the gram strings instead. Distinct-gram semantics
  * differ from the composable form only if two different grams collide
  * (~1e-10 at corpus scale).
  */
case class NgramHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes expects (array<string>, n >= 1), got " +
        s"(${child.dataType.catalogString}, $n)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(words: Any): Any =
    NgramHashes.hashes(words.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramHashes.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramHashesExpr =
    copy(child = newChild)
}

object NgramHashes {

  private val Seed = 42L

  /** Fused pass, called from generated code. Returns the sorted
    * distinct chained-xxhash64 values of all n-word grams; empty array
    * when the document has fewer than n words. */
  def hashes(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val wh = new Array[Long](len)
    var i = 0
    while (i < len) {
      val w = words.getUTF8String(i)
      // a null element hashes as the seed itself (split() never emits
      // nulls, but the expression must not NPE on hand-built arrays)
      wh(i) = if (w == null) Seed
        else XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, Seed)
      i += 1
    }
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var acc = Seed
      var k = 0
      while (k < n) { acc = XXH64.hashLong(wh(i + k), acc); k += 1 }
      out(i) = acc
      i += 1
    }
    java.util.Arrays.sort(out)
    var u = 0
    var j = 1
    while (j < m) {
      if (out(j) != out(u)) { u += 1; out(u) = out(j) }
      j += 1
    }
    new GenericArrayData(
      if (u + 1 == m) out else java.util.Arrays.copyOf(out, u + 1))
  }

  /** Shared builder for both registration paths (register() below and
    * GraftExtensions.injectFunction) — ONE place for the literal-n rule
    * so the two cannot drift (r9 ADVICE). n must be an integer LITERAL:
    * it is a structural parameter, not data (a foldable-but-non-Literal
    * n like `CAST(8 AS INT)` is rejected with the same usage error —
    * fold it before calling). */
  val builder: Seq[Expression] => Expression = {
    case Seq(words, Literal(n: Int, _)) => NgramHashesExpr(words, n)
    case _ => throw new IllegalArgumentException(
      "usage: ngram_hashes(array<string>, <int literal>)")
  }

  /** Register `ngram_hashes` into an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_hashes", builder, "built-in")
}
