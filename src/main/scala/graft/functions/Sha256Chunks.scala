package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `sha256_chunks(s)` — the SHA-256 digest of a string as 8 unsigned
  * 32-bit big-endian longs (digest bytes 4j..4j+3 → element j+1).
  *
  * Bit-identical to the composable
  * `conv(substring(sha2(s, 256), 1 + 8*j, 8), 16, 10)` per chunk — and
  * to DuckDB's `CAST('0x' || substr(sha256(s), 1+8*j, 8) AS BIGINT)`,
  * which is what keeps the MinHash oracles engine-portable — but with
  * the hex-string round trip gone: sha2 renders 64 hex chars, then each
  * of the 8 chunk extractions pays a substring slice plus conv's
  * radix-16 string parse, per shingle row. One digest → 8 shifts is the
  * whole evaluation here (minhash sigs probe at sf0.1: the conv path
  * held the signature aggregation at ~1.0 s; this expression cuts the
  * per-row cost to the digest itself).
  *
  * The first 60 bits (the engine-portable positive-BIGINT token hash
  * behind llm_simhash_pairs, = `conv(substring(sha2(s,256),1,15),16,10)`)
  * recombine as `shiftleft(ch[0], 28) + shiftright(ch[1], 4)`.
  */
case class Sha256ChunksExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sha256_chunks expects a string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sha256_chunks"

  override def nullSafeEval(s: Any): Any =
    Sha256Chunks.chunks(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sha256Chunks.chunks($c)")

  override protected def withNewChildInternal(newChild: Expression): Sha256ChunksExpr =
    copy(child = newChild)
}

object Sha256Chunks {

  // MessageDigest is stateful — one instance per task thread
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }

  /** Called from generated code. */
  def chunks(s: UTF8String): ArrayData = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    val out = new Array[Long](8)
    var j = 0
    while (j < 8) {
      out(j) = ((bytes(4 * j) & 0xffL) << 24) |
        ((bytes(4 * j + 1) & 0xffL) << 16) |
        ((bytes(4 * j + 2) & 0xffL) << 8) |
        (bytes(4 * j + 3) & 0xffL)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Shared builder for both registration paths. */
  val builder: Seq[Expression] => Expression = {
    case Seq(s) => Sha256ChunksExpr(s)
    case other => throw new IllegalArgumentException(
      s"usage: sha256_chunks(string) — got ${other.length} argument(s)")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sha256_chunks", builder, "built-in")
}
