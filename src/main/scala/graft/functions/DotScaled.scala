package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native scaled-integer dot product: `dot_scaled(a, b)` =
  * Σ floor(a[i]·1e6 + 0.5) · floor(b[i]·1e6 + 0.5) over float arrays.
  *
  * The composable formulation (`aggregate(zip_with(...))`) is correct
  * but `zip_with`/`aggregate` are higher-order functions — they
  * evaluate via interpreted lambdas (CodegenFallback) and allocate an
  * intermediate array per row pair. On the ANN/near-dup pair stages
  * (millions of pairs × 64 dims) that interpretation cost dominated
  * BENCH. This expression is one fused codegen'd loop over the two
  * ArrayData buffers: no allocation, no virtual calls, stays inside
  * WholeStageCodegen. Exact same arithmetic (deterministic fixed-point)
  * so oracle results are unchanged.
  */
case class DotScaledExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_scaled expects (array<float>, array<float>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_scaled"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotScaled.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotScaled.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotScaledExpr = copy(left = newLeft, right = newRight)
}

object DotScaled {

  /** Fused loop, called from generated code. Length = min(|a|, |b|)
    * (zip_with semantics would null-pad; embeddings are fixed-dim so
    * lengths always match in practice). */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = math.floor(a.getFloat(i).toDouble * 1000000 + 0.5).toLong
      val y = math.floor(b.getFloat(i).toDouble * 1000000 + 0.5).toLong
      acc += x * y
      i += 1
    }
    acc
  }

  /** Register `dot_scaled` into an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_scaled", (children: Seq[Expression]) =>
        DotScaledExpr(children.head, children(1)), "built-in")
}
