package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join: pair each point with
  * every interval containing it, half-open `start <= p < end` — the
  * second classic join Spark's equi-join planner can't express (it
  * falls back to BroadcastNestedLoopJoin, which is fine ONLY when one
  * side broadcasts; DuckDB ships a specialized inequality join, which
  * is this operator's oracle).
  *
  * Shape: bucketize the shared domain at a fixed width, explode each
  * interval over the buckets it touches, equi-join points on bucket,
  * then filter the exact containment predicate. The equi join gives
  * Catalyst a hash key — shuffle or broadcast chosen as usual, AQE
  * skew-split applies — and the intermediate size is
  * intervals × (span/width + 1) + matched pairs, NEVER the cross
  * product. `bucketWidth` is the knob: ~the median interval span
  * minimizes (explode fan-out) × (points per bucket); callers with
  * heavy-tailed spans should cap or split outlier intervals first
  * (a pathological interval explodes span/width bucket rows).
  *
  * Bucket assignment uses truncating `div` on both sides; it is
  * monotone, so every contained point's bucket falls inside the
  * interval's exploded bucket range even across a zero crossing
  * (buckets near zero are merely narrower). Degenerate intervals
  * (end <= start) contain nothing and drop early.
  */
object Ranges {
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = intervals.columns.toSet.intersect(points.columns.toSet)
    require(overlap.isEmpty, s"points/intervals name collision: $overlap")
    val iv = intervals.where(col(endCol) > col(startCol))
      .withColumn("_b", explode(expr(
        s"sequence($startCol div $bucketWidth, ($endCol - 1) div $bucketWidth)")))
    points.withColumn("_b", expr(s"$pointCol div $bucketWidth"))
      .join(iv, Seq("_b"))
      .where(col(startCol) <= col(pointCol) && col(pointCol) < col(endCol))
      .drop("_b")
  }

  /** Interval-overlap join: pair rows of `a` and `b` whose half-open
    * intervals intersect (`sA < eB && sB < eA`), optionally within
    * equal `keys`. Same bucketization as [[pointInInterval]]; a pair
    * whose intervals share several buckets would match once per shared
    * bucket, so each pair is emitted ONLY in the bucket containing its
    * overlap's start — `greatest(sA, sB) div width`, which truncating
    * div's monotonicity guarantees is in both sides' bucket
    * enumerations (div commutes with max) — making the join
    * exactly-once without a distinct pass. Non-key column names must
    * be disjoint across `a` and `b`. */
  def intervalOverlap(a: DataFrame, b: DataFrame, keys: Seq[String],
      startA: String, endA: String, startB: String, endB: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = a.columns.toSet.intersect(b.columns.toSet) -- keys
    require(overlap.isEmpty, s"non-key column collision: $overlap")
    def exploded(df: DataFrame, s: String, e: String) =
      df.where(col(e) > col(s)).withColumn("_b", explode(expr(
        s"sequence($s div $bucketWidth, ($e - 1) div $bucketWidth)")))
    exploded(a, startA, endA)
      .join(exploded(b, startB, endB), keys :+ "_b")
      .where(col(startA) < col(endB) && col(startB) < col(endA) &&
        col("_b") === expr(s"greatest($startA, $startB) div $bucketWidth"))
      .drop("_b")
  }
}
