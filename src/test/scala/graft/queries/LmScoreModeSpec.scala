package graft.queries

import graft.SparkSpec

/** r12 VERDICT #7 + r13 VERDICT #1: `spark.graft.lmScore.broadcastModel`
  * gates BOTH model joins — c2 (bigram counts) and c1 (context totals).
  * Default (true) broadcasts both, so the exploded bigram-instance
  * stream is never shuffled and the scorer is map-side up to the
  * per-doc groupBy; false swaps both for plain equi-joins (the
  * scale-safe shape when a tokenizer makes the model corpus-sized).
  * The conf must change the JOIN STRATEGY, never the scores. */
class LmScoreModeSpec extends SparkSpec {
  import spark.implicits._

  override def withFixture(test: NoArgTest) =
    try super.withFixture(test) finally graft.ops.Releases.drain()

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the log and the cat ran"),
    (3L, "cat cat cat dog"),
    (4L, "one token"),
    (5L, "the mat sat on the cat on the mat")
  ).toDF("doc_id", "text")

  private def scores(broadcastModel: Boolean): Seq[(Long, Long, Long)] = {
    spark.conf.set("spark.graft.lmScore.broadcastModel", broadcastModel.toString)
    try LlmOps.lmScore(docs).as[(Long, Long, Long)].collect().sorted.toSeq
    finally spark.conf.unset("spark.graft.lmScore.broadcastModel")
  }

  test("scores are identical under broadcast and join-shaped model modes") {
    val a = scores(broadcastModel = true)
    val b = scores(broadcastModel = false)
    assert(a == b && a.size == 5)
  }

  test("default (conf unset) is the broadcast shape; conf=false removes every " +
      "broadcast from the model join subtree") {
    // count BroadcastExchange nodes in the executed plan under each mode,
    // with auto-broadcast disabled so Catalyst cannot re-introduce one
    // from size estimates and mask a missing/leftover hint
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // count on the FORMATTED executed plan: AQE wraps exchanges in
    // leaf BroadcastQueryStageExec nodes a tree walk can't descend
    def broadcasts(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      "BroadcastExchange\\b".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    }
    try {
      val withHint = broadcasts(LlmOps.lmScore(docs))
      assert(withHint >= 2,
        s"default mode must broadcast BOTH c2 and c1 (saw $withHint " +
          "BroadcastExchange nodes) — the bg side must never shuffle")
      spark.conf.set("spark.graft.lmScore.broadcastModel", "false")
      val without = broadcasts(LlmOps.lmScore(docs))
      assert(without == 0,
        s"join-shaped mode still broadcasts ($without BroadcastExchange nodes)")
    } finally {
      spark.conf.unset("spark.graft.lmScore.broadcastModel")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
    }
  }

  test("fallback mode has ZERO broadcast on the model joins even under the " +
      "DEFAULT auto-broadcast threshold (r14 VERDICT #7)") {
    // The previous case proves zero-broadcast with auto-broadcast
    // DISABLED — i.e. that no leftover broadcast() hint survives. The
    // scale risk is the opposite direction: a conf=false user has a
    // corpus-sized model, and Catalyst's size ESTIMATE of the tiny-
    // looking aggregation output sits far under the default 10 MB
    // autoBroadcastJoinThreshold, so absent a veto Catalyst would
    // re-broadcast exactly the relation the user said must never be
    // shipped. The merge hint on both model joins is that veto; this
    // test runs with the session's default threshold untouched (a
    // 5-doc model WOULD auto-broadcast without the hint — the first
    // case's `withHint >= 2` under disabled auto-broadcast only passes
    // because of explicit broadcast(), so estimates here are small
    // enough to trip the default threshold). The one-row vocab
    // crossJoin legitimately broadcasts as a BroadcastNestedLoopJoin
    // under the default threshold (and SHOULD — it is one row), so the
    // assertion targets BroadcastHashJoin: the only shape a
    // re-broadcast MODEL equi-join can take.
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1")
    spark.conf.set("spark.graft.lmScore.broadcastModel", "false")
    try {
      val df = LlmOps.lmScore(docs)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val n = "BroadcastHashJoin\\b".r.findAllIn(plan).length
      assert(n == 0,
        s"size-estimate re-broadcast leaked into fallback mode ($n BHJ nodes):\n$plan")
      assert("SortMergeJoin\\b".r.findAllIn(plan).length >= 2,
        "both model joins should be sort-merge under the merge hint")
    } finally spark.conf.unset("spark.graft.lmScore.broadcastModel")
  }
}
