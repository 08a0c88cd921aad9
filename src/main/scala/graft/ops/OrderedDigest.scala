package graft.ops

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** Scale-safe order-sensitive per-key digest (ADVICE r01 on
  * h3_composite_digest): the `collect_list + array_sort + sha2`
  * formulation holds each group in executor memory — fine for H3's
  * real-world groups (a handful of postprocessing scripts), a
  * scale-killer on an unbounded hot key. This operator computes the
  * same digest with O(1) per-key state:
  *
  *   repartition by key → sortWithinPartitions(key, seq) →
  *   mapPartitions streaming each key's values through an incremental
  *   MessageDigest.
  *
  * One shuffle (same as the groupBy), no per-group materialization. */
object OrderedDigest {

  final case class Keyed(key: String, seq: Long, value: String)
  final case class KeyDigest(key: String, digest: String, n: Long)

  /** sha256 hex of the ' '-joined values of each key, in `seq`
    * order, truncated to `takeChars` chars. */
  def perKeyDigest(df: DataFrame, keyCol: String, seqCol: String,
      valueCol: String, takeChars: Int = 64): Dataset[KeyDigest] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("key"),
        col(seqCol).cast("long").as("seq"),
        col(valueCol).cast("string").as("value"))
      .as[Keyed]
      .repartition(col("key"))
      .sortWithinPartitions("key", "seq", "value")
      .mapPartitions { rows =>
        new Iterator[KeyDigest] {
          private var pending: Option[Keyed] = None
          private var out: Option[KeyDigest] = None
          private def hex(b: Array[Byte]) = b.map(x => f"$x%02x").mkString
          def hasNext: Boolean = out.isDefined || pending.isDefined || rows.hasNext
          def next(): KeyDigest = {
            if (out.isDefined) { val r = out.get; out = None; return r }
            val first = pending.orElse(if (rows.hasNext) Some(rows.next()) else None)
              .getOrElse(throw new NoSuchElementException)
            pending = None
            val md = MessageDigest.getInstance("SHA-256")
            var n = 0L
            var cur = first
            var done = false
            while (!done) {
              if (n > 0) md.update(' '.toByte) // ' '-joined, same as array_join(…, " ")
              md.update(cur.value.getBytes("UTF-8"))
              n += 1
              if (rows.hasNext) {
                val nx = rows.next()
                if (nx.key == cur.key) cur = nx
                else { pending = Some(nx); done = true }
              } else done = true
            }
            KeyDigest(first.key, hex(md.digest()).take(takeChars), n)
          }
        }
      }
  }
}
