package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
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

  private val HexChars = "0123456789abcdef".toCharArray

  /** Table-driven hex of the first `takeChars` nibbles. The obvious
    * `map(b => f"$b%02x")` runs a String.format PER BYTE — at sf1 the
    * c14 digest stage spent most of its CPU (and, through format
    * garbage, up to ~95 s of stage GC) in exactly that call: 1.5 M
    * keys × 32 bytes = 48 M formatter invocations per pass. */
  private def hex(bytes: Array[Byte], takeChars: Int): String = {
    val n = math.min(takeChars, bytes.length * 2)
    val out = new Array[Char](n)
    var i = 0
    while (i < n) {
      val b = bytes(i >> 1) & 0xff
      out(i) = HexChars(if ((i & 1) == 0) b >> 4 else b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** sha256 hex of the `sep`-joined `value` strings of each key in
    * `sortCols` order, truncated to `takeChars` chars, plus the group
    * size — columns (<key>, digest, n).
    *
    * `value` is a Column EXPRESSION over `df`'s columns, rendered
    * AFTER the shuffle + sort (guide §2.3: shuffle keys and typed
    * metadata, not rendered payloads): the exchange carries only
    * (key, sortCols) in their original narrow types, and the
    * string-render work runs on the full digest-stage width instead
    * of the scan's split count. Columns `value` references but that
    * are not sort columns ride the exchange in their original types
    * (the determinism contract still requires sort-column ties to
    * imply equal rendered values). */
  def perKeyDigest(df: DataFrame, keyCol: String, sortCols: Seq[String],
      value: Column, sep: String = " ", takeChars: Int = 64): DataFrame = {
    // resolve which of df's columns the value expression reads (the
    // Column API no longer exposes the expression tree directly, so
    // analyze a throwaway projection — driver-side, no job)
    val valueRefs = df.select(value).queryExecution.analyzed.expressions
      .flatMap(_.references.map(_.name))
    val carry = (sortCols ++ valueRefs).distinct.filterNot(_ == keyCol)
    val projected = df.select((keyCol +: carry).map(col): _*)
    // Width PINNED to the session's input-sized shuffle width (r18):
    // a bare repartition(col) is REPARTITION_BY_COL, which AQE's
    // byte-based coalescer may legally shrink — the advisory size
    // cannot see that the stage below is compute-heavy per row
    // (deserialize + render + sha256), so the width is pinned — to
    // the SAME ShuffleWidth-derived session value, not a constant,
    // so it stays scale-adaptive.
    val width = df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = projected
      .repartition(width, col(keyCol))
      .sortWithinPartitions(keyCol +: sortCols map col: _*)
      // narrow to (key, value) ABOVE the sort: the sort columns have
      // done their job ordering the partition; rendering the value
      // here (post-shuffle, post-sort) cuts the DeserializeToObject
      // boundary to exactly two objects per row and spreads the
      // render across the digest stage's width
      .select(col(keyCol), value.cast("string").as("_v"))
    val outSchema = StructType(Seq(
      sorted.schema(keyCol),
      StructField("digest", StringType, nullable = false),
      StructField("n", LongType, nullable = false)))
    val sepBytes = sep.getBytes("UTF-8")
    sorted.mapPartitions { rows =>
      // one digest instance per task, reset per group — getInstance
      // per key was measurable at millions of keys
      val md = MessageDigest.getInstance("SHA-256")
      new Iterator[Row] {
        private var pending: Row = null
        def hasNext: Boolean = pending != null || rows.hasNext
        def next(): Row = {
          val first = if (pending != null) pending else rows.next()
          pending = null
          val key = first.get(0)
          md.reset()
          var n = 0L
          var cur = first
          var done = false
          while (!done) {
            if (n > 0) md.update(sepBytes)
            md.update(cur.getString(1).getBytes("UTF-8"))
            n += 1
            if (rows.hasNext) {
              val nx = rows.next()
              if (java.util.Objects.equals(nx.get(0), key)) cur = nx
              else { pending = nx; done = true }
            } else done = true
          }
          Row(key, hex(md.digest(), takeChars), n)
        }
      }
    }(Encoders.row(outSchema))
  }
}
