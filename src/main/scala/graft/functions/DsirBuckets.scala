package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused per-document DSIR hashed-ngram feature histogram:
  * `dsir_bucket_hist(words, B)` = `array<long>` of length B — how many
  * of the document's consecutive bigrams hash into each of B buckets —
  * in ONE codegen'd pass with NO shuffle.
  *
  * The bucket of a bigram is EXACTLY the llm_dsir_weights contract the
  * DuckDB oracle replays: the first 15 hex chars (60 bits) of
  * `sha256(w1 ⧺ ' ' ⧺ w2)` as an unsigned integer, mod B — the
  * engine-portable hashed-ngram trick from DSIR (Xie et al. 2023)
  * that keeps the model B counters instead of a vocabulary.
  *
  * What it replaces (kept verbatim as the executable spec in
  * DsirBucketsSpec): explode every bigram into an instance row,
  * sha-hash it via string expressions, and run per-instance
  * aggregations/joins — TWICE, because the bucket stats and the
  * scoring pass are separate consumers. With the histogram fused
  * per-row, the stats side aggregates B-bounded posexplode rows and
  * the scoring side is a zero-shuffle dot product against the
  * broadcast B-row ratio table ([[graft.queries.LlmOps]]).
  *
  * Exactness contract:
  *   - bigram i = words[i] ⧺ ' ' ⧺ words[i+1], hashed as UTF-8 bytes
  *     streamed into one sha256 (no joined-string alloc);
  *   - a bigram containing a NULL word is SKIPPED (not counted in any
  *     bucket, not in Σ) — NEWLY PINNED: the replaced explode produced
  *     a NULL hash whose instance row then dropped from every
  *     bucket-keyed join, so "skipped" is what the old plan computed,
  *     now stated rather than emergent (unreachable from
  *     `split(text, ' ')`);
  *   - fewer than 2 words → NULL (no bigram exists; callers drop).
  *
  * Σ over the histogram = the document's counted-bigram total, so
  * `n_bigrams` needs no second pass. O(B) state per row. */
case class DsirBucketHistExpr(child: Expression, b: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if b >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dsir_bucket_hist expects (array<string>, B >= 1); got " +
        s"(${other.catalogString}, $b)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dsir_bucket_hist"
  override def nullable: Boolean = true

  override def nullSafeEval(words: Any): Any =
    DsirBuckets.hist(words.asInstanceOf[ArrayData], b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.DsirBuckets.hist($c, $b);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DsirBucketHistExpr =
    copy(child = newChild)
}

object DsirBuckets {

  private val Space = ' '.toByte

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }

  /** Called from generated code: one pass over the word array; each
    * bigram's bytes stream into one sha256, the first 60 digest bits
    * (15 hex chars, the oracle's '0x' || substr parse) mod B pick the
    * bucket. Returns NULL for arrays with fewer than 2 elements. */
  def hist(words: ArrayData, b: Int): ArrayData = {
    val len = words.numElements()
    if (len < 2) return null
    val counts = new Array[Long](b)
    val d = md.get()
    var i = 0
    while (i < len - 1) {
      if (!words.isNullAt(i) && !words.isNullAt(i + 1)) {
        d.reset()
        d.update(words.getUTF8String(i).getBytes)
        d.update(Space)
        d.update(words.getUTF8String(i + 1).getBytes)
        val h = d.digest()
        val v = ((h(0) & 0xffL) << 52) | ((h(1) & 0xffL) << 44) |
          ((h(2) & 0xffL) << 36) | ((h(3) & 0xffL) << 28) |
          ((h(4) & 0xffL) << 20) | ((h(5) & 0xffL) << 12) |
          ((h(6) & 0xffL) << 4) | ((h(7) & 0xf0L) >>> 4)
        counts((v % b).toInt) += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  val builder: Seq[Expression] => Expression = {
    case Seq(words, Literal(b: Int, _)) => DsirBucketHistExpr(words, b)
    case other => throw new IllegalArgumentException(
      "usage: dsir_bucket_hist(array<string>, B) with literal int B — got " +
        other.mkString(", "))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dsir_bucket_hist", builder, "built-in")
}
