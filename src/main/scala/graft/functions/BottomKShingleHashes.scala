package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused bottom-k shingle-hash document fingerprint:
  * `bottomk_shingle_hashes(words, k)` = the `llm_fingerprint` string —
  * the k smallest DISTINCT `substr(sha256(shingle), 1, 12)` values of
  * the document's consecutive 3-token shingles, ascending, joined by
  * `-` — in ONE codegen'd pass with NO shuffle.
  *
  * What it replaces (kept verbatim as the executable spec in
  * BottomKShingleHashesSpec): explode every shingle into instance
  * rows, fan them out, sha2 each as a STRING expression, then
  * `collect_set` + `array_sort` + `slice` behind a hash exchange —
  * the whole corpus re-rendered as 12-char hash strings and shuffled,
  * for a value that is strictly PER-DOCUMENT. Same collapse as
  * [[RepetitionStatsExpr]]: scan → project, zero exchange, O(k)
  * running state per row.
  *
  * Exactness contract:
  *   - shingle i = words i..i+2 joined by single spaces, NULL words
  *     skipped with their delimiter (`concat_ws` semantics, matching
  *     the `Winnow.shingles` column it replaces; unreachable from
  *     `split`, pinned for arbitrary arrays);
  *   - the 12-hex-char prefix of sha256 is EXACTLY the first 6 digest
  *     bytes, and lexicographic order over the lowercase-hex strings
  *     equals unsigned numeric order over those 48 bits — so the
  *     bottom-k runs on 48-bit longs (no per-shingle string renders)
  *     and only the k winners are hex-rendered at the end;
  *   - distinctness is on the 12-char prefix (the replaced
  *     collect_set deduped the SUBSTRINGS), so two shingles sharing a
  *     48-bit prefix count once — bit-for-bit the old semantics;
  *   - fewer than 3 words → NULL (callers filter `size(toks) >= 3`).
  */
case class BottomKShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bottomk_shingle_hashes expects (array<string>, k >= 1); got " +
        s"(${other.catalogString}, $k)")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "bottomk_shingle_hashes"
  override def nullable: Boolean = true

  override def nullSafeEval(words: Any): Any =
    BottomKShingleHashes.fingerprint(words.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.BottomKShingleHashes.fingerprint($c, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BottomKShingleHashesExpr =
    copy(child = newChild)
}

object BottomKShingleHashes {

  private val Space = ' '.toByte
  private val HexChars = "0123456789abcdef".toCharArray

  // MessageDigest is stateful — one instance per task thread (the
  // MinhashBandKeys pattern)
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }

  /** Called from generated code: one pass over the word array; each
    * shingle's bytes stream into one sha256 (no joined-string alloc),
    * the first 6 digest bytes become an unsigned 48-bit value, and a
    * k-slot insertion keeps the distinct minima. Returns NULL for
    * arrays with fewer than 3 elements (no shingle exists). */
  def fingerprint(words: ArrayData, k: Int): UTF8String = {
    val len = words.numElements()
    if (len < 3) return null
    val n = len - 2
    val best = new Array[Long](k) // ascending; count in `filled`
    var filled = 0
    val d = md.get()
    var i = 0
    while (i < n) {
      d.reset()
      var first = true
      var j = i
      while (j < i + 3) {
        if (!words.isNullAt(j)) {
          if (!first) d.update(Space)
          d.update(words.getUTF8String(j).getBytes)
          first = false
        }
        j += 1
      }
      val b = d.digest()
      val v = ((b(0) & 0xffL) << 40) | ((b(1) & 0xffL) << 32) |
        ((b(2) & 0xffL) << 24) | ((b(3) & 0xffL) << 16) |
        ((b(4) & 0xffL) << 8) | (b(5) & 0xffL)
      // distinct bottom-k insertion (k is tiny — linear is optimal)
      var p = 0
      var dup = false
      while (p < filled && best(p) < v) p += 1
      if (p < filled && best(p) == v) dup = true
      if (!dup && p < k) {
        val last = math.min(filled, k - 1)
        var q = last
        while (q > p) { best(q) = best(q - 1); q -= 1 }
        best(p) = v
        if (filled < k) filled += 1
      }
      i += 1
    }
    val out = new Array[Char](filled * 13 - 1)
    var o = 0
    var s = 0
    while (s < filled) {
      if (s > 0) { out(o) = '-'; o += 1 }
      var shift = 44
      while (shift >= 0) {
        out(o) = HexChars(((best(s) >>> shift) & 0xf).toInt)
        o += 1
        shift -= 4
      }
      s += 1
    }
    UTF8String.fromString(new String(out))
  }

  val builder: Seq[Expression] => Expression = {
    case Seq(words, Literal(k: Int, _)) => BottomKShingleHashesExpr(words, k)
    case other => throw new IllegalArgumentException(
      "usage: bottomk_shingle_hashes(array<string>, k) with literal " +
        s"int k — got ${other.mkString(", ")}")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottomk_shingle_hashes", builder, "built-in")
}
