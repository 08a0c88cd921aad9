package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bottom-k DISTINCT values as a true bounded-state aggregate.
  *
  * `slice(array_sort(collect_set(x)), 1, k)` is semantically the same
  * sketch, but its per-group state is the ENTIRE distinct set — for a
  * fingerprinting pass over 100 TB documents that is each document's
  * full shingle-hash set (unbounded: a pathological document holds
  * millions of hashes) held in the aggregation buffer just to throw
  * all but k away at the end. This Aggregator caps the buffer at k
  * values for the whole lifecycle: reduce inserts into a k-bounded
  * sorted list, merge folds one bounded list into the other, so
  * partial aggregation, spill sizes and network bytes are all O(k)
  * per group regardless of group fan-in.
  *
  * A typed `Aggregator` registered through `udaf()` — it plans as
  * ObjectHashAggregate exactly like collect_set, so the swap changes
  * state bounds, not the plan shape. Distinctness is inherent (insert
  * dedups), which is what bottom-k sketches for containment/MinHash
  * style fingerprints require.
  */
case class BottomKDistinct(k: Int)
    extends Aggregator[String, List[String], Seq[String]] {
  require(k > 0, s"k must be positive, got $k")

  // buffer invariant: sorted ascending, distinct, length <= k
  def zero: List[String] = Nil

  private def insert(b: List[String], a: String): List[String] =
    if (a == null) b
    else if (b.length == k && b.last <= a) b // fast path: can't enter
    else if (b.contains(a)) b
    else (a :: b).sorted.take(k)

  def reduce(b: List[String], a: String): List[String] = insert(b, a)
  def merge(x: List[String], y: List[String]): List[String] =
    y.foldLeft(x)(insert)
  def finish(b: List[String]): Seq[String] = b

  def bufferEncoder: Encoder[List[String]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}

/** Bottom-k DISTINCT longs — same bounded-state contract as
  * [[BottomKDistinct]], but with NUMERIC ordering (routing doc ids
  * through the string variant would sort lexicographically: "10" before
  * "2" — wrong for posting lists). Buffer invariant and O(k) state
  * bounds are identical.
  */
case class BottomKDistinctLong(k: Int)
    extends Aggregator[Long, List[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  // buffer invariant: sorted ascending, distinct, length <= k
  def zero: List[Long] = Nil

  private def insert(b: List[Long], a: Long): List[Long] =
    if (b.length == k && b.last <= a) b // fast path: can't enter
    else if (b.contains(a)) b
    else (a :: b).sorted.take(k)

  def reduce(b: List[Long], a: Long): List[Long] = insert(b, a)
  def merge(x: List[Long], y: List[Long]): List[Long] =
    y.foldLeft(x)(insert)
  def finish(b: List[Long]): Seq[Long] = b

  def bufferEncoder: Encoder[List[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object BottomK {
  /** Column form: bottom-k distinct strings of `c`, sorted ascending. */
  def bottomKDistinct(c: Column, k: Int): Column =
    udaf(BottomKDistinct(k)).apply(c)

  /** Column form: bottom-k distinct longs of `c`, sorted ascending. */
  def bottomKDistinctLong(c: Column, k: Int): Column =
    udaf(BottomKDistinctLong(k), ExpressionEncoder[Long]()).apply(c)
}
