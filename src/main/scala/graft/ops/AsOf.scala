package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed backward as-of join: for each left row, attach the
  * single most recent right row whose time is ≤ the left row's time
  * (`strict = true`: strictly <) within the same key group — the
  * time-series join Spark's relational API lacks (the reference
  * family's analog is the event-against-latest-state lookup; DuckDB
  * ships it natively as `ASOF JOIN`, which is this operator's oracle).
  *
  * Shape: union-tag both sides, ONE window over (keys) ordered by
  * (ts, side) carrying the last non-null right payload forward, keep
  * the left rows. Compared to the two classic alternatives:
  *  - range-expanded equi join (explode each right row over its
  *    validity interval): blows up with interval length — unbounded
  *    fan-out on sparse keys;
  *  - per-key collect + binary search: driver- or memory-bound state
  *    per key.
  * The union-window form shuffles each input exactly once (the window
  * exchange on keys), sorts within key partitions only, and carries
  * O(1) running state per partition — at any scale the cost is one
  * co-partitioning of both inputs, the same lower bound a shuffled
  * equi join pays. Skew equals the hottest key's row count, the same
  * exposure (and same salting remedies) as any keyed window.
  *
  * At equal timestamps, `strict = false` (inclusive) sorts right rows
  * BEFORE the left rows they match; `strict = true` sorts them after,
  * so equal-time right rows are invisible. Among multiple right rows
  * with the SAME (keys, ts), the carried row is the last in sort
  * order — not deterministic; pre-aggregate the right side to one row
  * per (keys, ts) when that matters (as `q7_asof_events` does).
  *
  * Right columns other than `keys`/`rightTs` become the attached
  * payload (null when no right row qualifies); their names must not
  * collide with left's.
  */
object AsOf {
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, strict: Boolean = false): DataFrame = {
    val payCols = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    require(payCols.nonEmpty, "right side has no payload columns")
    val overlap = payCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"payload/left name collision: $overlap")
    val (rSide, lSide) = if (strict) (1, 0) else (0, 1)
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(right.schema.fields.filter(f => payCols.contains(f.name)))
    val key: Seq[Column] = keys.map(col)
    val lTagged = left.select(key ++ Seq(
      col(leftTs).as("_ts"), lit(lSide).as("_side"),
      struct(left.columns.map(col).toSeq: _*).as("_lrow"),
      lit(null).cast(rStruct).as("_rpay")): _*)
    val rTagged = right.select(key ++ Seq(
      col(rightTs).as("_ts"), lit(rSide).as("_side"),
      lit(null).cast(lStruct).as("_lrow"),
      struct(payCols.map(col).toSeq: _*).as("_rpay")): _*)
    val w = Window.partitionBy(key: _*).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("_match", last(col("_rpay"), ignoreNulls = true).over(w))
      .where(col("_side") === lSide)
      .select(col("_lrow.*") +: payCols.map(c => col(s"_match.$c").as(c)): _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row whose
    * time is ≥ (`strict = true`: >) the left row's time within the
    * same key group. Time reversal maps it onto [[backward]] — negate
    * both time columns, run backward, restore — so the two directions
    * share one window implementation and one set of edge semantics.
    * Long.MinValue has no negation; times must exceed it (any real
    * epoch does). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, strict: Boolean = false): DataFrame = {
    val lNeg = left.withColumn(leftTs, -col(leftTs))
    val rNeg = right.withColumn(rightTs, -col(rightTs))
    backward(lNeg, rNeg, keys, leftTs, rightTs, strict)
      .withColumn(leftTs, -col(leftTs))
  }
}
