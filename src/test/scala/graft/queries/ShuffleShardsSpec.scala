package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** llm_shuffle_shards invariants the hash-compare can't express: the
  * assignment is a pure function of the DATA (stable under input
  * repartitioning — the property a training export needs across
  * cluster sizes), shards partition the corpus, and in-shard positions
  * are dense ranks. */
class ShuffleShardsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("shards partition the corpus; positions are dense per shard") {
    val rows = LlmOps.defs("llm_shuffle_shards").fn(spark, sf)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect()
    assert(rows.map(_._1).distinct.length == rows.length, "one row per doc")
    assert(rows.map(_._2).forall(s => s >= 0 && s < 8))
    rows.groupBy(_._2).foreach { case (_, shard) =>
      assert(shard.map(_._3).sorted.toSeq == (1L to shard.length).toSeq,
        "positions must be dense 1..n within a shard")
    }
  }

  test("assignment and order are invariant under input partitioning") {
    val base = LlmOps.defs("llm_shuffle_shards").fn(spark, sf)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // same data, adversarial partitioning: the result must not change
    val repartitioned = graft.Tables.documents(spark, sf).repartition(13)
    graft.functions.Sha256Chunks.register(spark)
    val hv = expr(
      "shiftleft(element_at(sha256_chunks(cast(doc_id as string)), 1), 28) + " +
        "shiftright(element_at(sha256_chunks(cast(doc_id as string)), 2), 4)")
    val alt = repartitioned
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"), hv.as("hv"))
      .withColumn("shard", pmod(col("hv"), lit(8L)))
      .withColumn("pos", row_number()
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("hv", "doc_id")).cast("long"))
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(alt == base)
  }
}
