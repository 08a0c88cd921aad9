package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the model-size gate on [[Streams.lmScoreStream]] (r17, closing
  * r16 VERDICT #1): above `maxMapModel` bigram entries the scorer must
  * plan as the O(1)-probe equi-join form — NO one-row broadcast-map
  * join whose per-bigram `element_at` is an O(|model|) linear scan —
  * and below it the small-model broadcast-map form is kept (right for
  * a trickle of arrivals against a curated model). Score identity
  * across the gate is asserted here on the same frame;
  * StreamBatchEquivSpec separately proves both forms equal batch
  * llm_lm_score through real micro-batched streams. */
class LmScoreStreamGateSpec extends SparkSpec {

  private def docs: DataFrame = {
    import spark.implicits._
    Seq(
      1L -> "the cat sat on the mat and the dog sat on the rug",
      2L -> "the cat sat on the mat",
      3L -> "qzx wvu plm okn ijb uhv ygc tfx rdz esw",
      4L -> "single").toDF("doc_id", "text")
  }

  private def model(d: DataFrame) = graft.queries.LlmOps.lmModel(d)

  test("above the gate: equi-join plan, no broadcast-map scan") {
    val (c2, c1, v) = model(docs)
    // every model is "big" at maxMapModel = 1
    val gated = Streams.lmScoreStream(docs, c2, c1, v, maxMapModel = 1L)
    val plan = gated.queryExecution.optimizedPlan.toString
    // the map form's signature is the one-row map build (element_at
    // also appears in the model build's transform over token ARRAYS —
    // that one is fine; the forbidden scan is element_at over a MAP,
    // which only exists downstream of map_from_entries)
    assert(!plan.contains("map_from_entries"),
      s"expected the equi-join scorer above the gate, got:\n$plan")
    assert(plan.contains("Join LeftOuter"), s"no model equi-join in:\n$plan")
  }

  test("below the gate: the broadcast-map form is kept") {
    val (c2, c1, v) = model(docs)
    val plan = Streams.lmScoreStream(docs, c2, c1, v, maxMapModel = 1000000L)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("map_from_entries"),
      s"expected the map form below the gate, got:\n$plan")
  }

  test("scores are identical on both sides of the gate") {
    import spark.implicits._
    val (c2, c1, v) = model(docs)
    def rows(maxMapModel: Long) =
      Streams.lmScoreStream(docs, c2, c1, v, maxMapModel)
        .select("doc_id", "n_bigrams", "avg_prob_ppm")
        .as[(Long, Long, Long)].collect().toSet
    val joinSide = rows(1L)
    val mapSide = rows(1000000L)
    assert(joinSide == mapSide,
      s"join-only: ${joinSide -- mapSide}\nmap-only: ${mapSide -- joinSide}")
    assert(joinSide.map(_._1) == Set(1L, 2L, 3L)) // 1-word doc drops
  }

  test("a streaming big-model source without an event-time column is rejected") {
    val (c2, c1, v) = model(docs)
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
      .select(col("value").as("doc_id"), lit("a b c").as("text"))
    val e = intercept[IllegalArgumentException] {
      Streams.lmScoreStream(stream, c2, c1, v, maxMapModel = 1L)
    }
    assert(e.getMessage.contains("ts"))
  }
}
