package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Scale-safe order-sensitive per-key digest (ADVICE r01 on
  * h3_composite_digest; wired into the C14/C16 merge signatures in
  * r18 — r17 VERDICT "Next" #4): the `collect_list + array_sort +
  * sha2(array_join)` formulation holds each group in executor memory —
  * fine at TPC-H group sizes (≤7 lineitems per order), a scale-killer
  * on real GTFS shapes with thousands of points per shape_id
  * (reference C14 semantics, import.sh:92-94). This operator computes
  * the SAME digest with O(1) per-key state:
  *
  *   repartition by key → sortWithinPartitions(key, sortCols…) →
  *   mapPartitions streaming each key's values through an incremental
  *   MessageDigest.
  *
  * One shuffle (same as the groupBy), no per-group materialization.
  * The key column keeps its ORIGINAL type (downstream min-id
  * canonical elections need numeric order, not string order).
  *
  * Determinism contract: `sortCols` must totally order DISTINCT
  * `valueCol` values within a key — rows tied on every sort column
  * may stream in any order, so their values must be equal (the C14/
  * C16 callers sort on every component of the rendered value, exactly
  * like their oracles' `string_agg(… ORDER BY …)` tie-breaks). */
object OrderedDigest {

  /** sha256 hex of the `sep`-joined `valueCol` strings of each key in
    * `sortCols` order, truncated to `takeChars` chars, plus the group
    * size — columns (<key>, digest, n). */
  def perKeyDigest(df: DataFrame, keyCol: String, sortCols: Seq[String],
      valueCol: String, sep: String = " ", takeChars: Int = 64): DataFrame = {
    val projected = df.select(
      col(keyCol) +: sortCols.map(col) :+ col(valueCol).cast("string"): _*)
    val sorted = projected
      .repartition(col(keyCol))
      .sortWithinPartitions(keyCol +: sortCols map col: _*)
    val valIdx = projected.columns.length - 1
    val outSchema = StructType(Seq(
      sorted.schema(keyCol),
      StructField("digest", StringType, nullable = false),
      StructField("n", LongType, nullable = false)))
    val sepBytes = sep.getBytes("UTF-8")
    sorted.mapPartitions { rows =>
      new Iterator[Row] {
        private var pending: Row = null
        def hasNext: Boolean = pending != null || rows.hasNext
        def next(): Row = {
          val first = if (pending != null) pending else rows.next()
          pending = null
          val key = first.get(0)
          val md = MessageDigest.getInstance("SHA-256")
          var n = 0L
          var cur = first
          var done = false
          while (!done) {
            if (n > 0) md.update(sepBytes)
            md.update(cur.getString(valIdx).getBytes("UTF-8"))
            n += 1
            if (rows.hasNext) {
              val nx = rows.next()
              if (java.util.Objects.equals(nx.get(0), key)) cur = nx
              else { pending = nx; done = true }
            } else done = true
          }
          val hex = md.digest().map(b => f"$b%02x").mkString.take(takeChars)
          Row(key, hex, n)
        }
      }
    }(Encoders.row(outSchema))
  }
}
