package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `sorted_intersect_count(a, b)` — |a ∩ b| of two SORTED-ascending
  * distinct `array<long>` columns (exactly what
  * [[NgramHashesExpr ngram_hashes]] emits), as one merge walk: O(|a|+|b|)
  * long compares, zero allocation. The composable
  * `size(array_intersect(a, b))` builds a hash set of one side and
  * probes per element, then materializes the intersection array only to
  * take its size — on the Jaccard re-rank's shingle sets that
  * set-build+probe+materialize was the per-pair hot loop.
  *
  * Precondition (NOT checked — it would cost the pass the expression
  * saves): both inputs sorted ascending with no duplicates. Unsorted
  * input silently undercounts; ngram_hashes output always qualifies.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects (array<bigint>, array<bigint>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersect.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedIntersect.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {

  /** Merge walk, called from generated code. A null element (legal in
    * hand-built arrays; ngram_hashes never emits one) never matches. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val va = a.getLong(i)
        val vb = b.getLong(j)
        if (va == vb) { n += 1; i += 1; j += 1 }
        else if (va < vb) i += 1
        else j += 1
      }
    }
    n
  }

  /** Shared builder for both registration paths (the ADVICE-r9 pattern:
    * one place for the arity rule, register() and GraftExtensions both
    * delegate here). */
  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => SortedIntersectCountExpr(a, b)
    case other => throw new IllegalArgumentException(
      s"usage: sorted_intersect_count(array<bigint>, array<bigint>) — " +
        s"got ${other.length} argument(s)")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", builder, "built-in")
}
