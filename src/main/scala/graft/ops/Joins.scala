package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (builder brief: "salting for skew").
  *
  * AQE's skew-join split (on by default) handles most skew at runtime;
  * explicit salting remains the tool when one key is so hot that even
  * split shuffle blocks overwhelm a task, or when AQE is unavailable
  * (e.g. inside a cached stage). */
object Joins {

  /** Salted inner equi-join: the big (skewed) side scatters each row to
    * one of `salt` shards; the small side is replicated `salt` times so
    * every shard can match. Result set identical to
    * `big.join(small, key)`; the hot key's work spreads over `salt`
    * tasks instead of one.
    *
    * The salt column uses rand(seed) — per-row arbitrary is all that is
    * required for correctness (each big row joins exactly once). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int, seed: Long = 42L): DataFrame = {
    require(salt > 0)
    val bigS = big.withColumn("_salt", floor(rand(seed) * salt).cast("int"))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<int>")))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}
