package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** llm_approx_stats has no DuckDB oracle by design (sketch estimates
  * are estimator-defined; DuckDB's approx functions implement different
  * estimators). This spec supplies the correctness evidence instead:
  *  - HLL++ cardinalities within a bound tied to the configured rsd;
  *  - approx quantiles within the rank-error guarantee
  *    (percentile_approx with accuracy A: rank error <= n/A);
  *  - estimates INVARIANT under repartitioning — the property that
  *    makes sketches the 100 TB path (partial sketches merge
  *    associatively, so the answer cannot depend on the partitioning).
  */
class ApproxStatsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def approx() = LlmOps.approxStatsEstimates(spark, sf)
    .select("lang", "distinct_tokens", "n_docs_est",
      "p50_tokens_est", "p90_tokens_est")
    .as[(String, Long, Long, Long, Long)].collect()
    .map(r => r._1 -> r).toMap

  test("HLL++ cardinalities land within the rsd-derived bound") {
    val exact = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy("lang")
      .agg(countDistinct("token").as("t"), countDistinct("doc_id").as("d"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    val est = approx()
    assert(est.keySet == exact.keySet)
    exact.foreach { case (lang, (_, t, d)) =>
      // rsd = 0.02 is a standard deviation; 5 sigma never fires falsely
      assert(math.abs(est(lang)._2 - t) <= math.max(1, (t * 0.10).toLong),
        s"$lang distinct tokens: est ${est(lang)._2} exact $t")
      assert(math.abs(est(lang)._3 - d) <= math.max(1, (d * 0.10).toLong),
        s"$lang distinct docs: est ${est(lang)._3} exact $d")
    }
  }

  test("approx quantiles respect the rank-error guarantee vs exact") {
    val lens = graft.Tables.documents(spark, sf)
      .select(col("lang"), size(split(col("text"), " ")).as("n"))
      .as[(String, Int)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    val est = approx()
    lens.foreach { case (lang, sorted) =>
      val n = sorted.length
      val slack = math.max(1, n / 1000) // accuracy=10000 ⇒ ≤ n/10000 ranks
      def rankRange(p: Double, v: Long): Unit = {
        val target = math.ceil(p * n).toInt
        val lo = sorted(math.max(0, target - 1 - slack))
        val hi = sorted(math.min(n - 1, target - 1 + slack))
        assert(v >= lo && v <= hi,
          s"$lang p$p: est $v outside rank-slack window [$lo, $hi]")
      }
      rankRange(0.5, est(lang)._4)
      rankRange(0.9, est(lang)._5)
    }
  }

  test("the audit query's in-bounds flags all read 1 (driver contract)") {
    val rows = LlmOps.defs("llm_approx_stats").fn(spark, sf)
      .select("lang", "hll_tokens_ok", "hll_docs_ok", "p50_ok", "p90_ok")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, a, b, c, d) =>
      assert(a == 1L && b == 1L && c == 1L && d == 1L,
        s"$lang flags: hll_tokens=$a hll_docs=$b p50=$c p90=$d")
    }
  }

  test("audit-fused HLLs equal the instance-stream estimates (set semantics)") {
    // r18 OPT: llm_approx_stats rides its HLLs on the exact
    // aggregations — token HLL above the (lang, token) dedup, doc_id
    // HLL on un-exploded doc rows — instead of re-running
    // approxStatsEstimates' exploded instance stream. HLL inserts are
    // idempotent, so estimates over the deduped set must be IDENTICAL
    // to estimates over the instance stream; this pins that identity
    // (the rewrite's whole correctness argument).
    val docs = graft.Tables.documents(spark, sf)
    val fused = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("_c"))
      .groupBy("lang").agg(
        approx_count_distinct(col("token"), rsd = 0.02).as("t"))
      .join(docs.groupBy("lang").agg(
        approx_count_distinct(col("doc_id"), rsd = 0.02).as("d")), Seq("lang"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    val inst = approx()
    assert(fused.keySet == inst.keySet)
    fused.foreach { case (lang, (_, t, d)) =>
      assert(t == inst(lang)._2, s"$lang token HLL: fused $t vs instance ${inst(lang)._2}")
      assert(d == inst(lang)._3, s"$lang doc HLL: fused $d vs instance ${inst(lang)._3}")
    }
  }

  test("estimates are invariant under repartitioning (sketch merge determinism)") {
    val once = approx()
    val docs = graft.Tables.documents(spark, sf)
    Seq(1, 13).foreach { parts =>
      val shuffled = docs.repartition(parts, col("doc_id"))
      val est = LlmOps.defs("llm_approx_stats")
        .fn(spark, sf) // plan identical; sanity anchor
      val reshaped = {
        val tokenCards = shuffled
          .select(col("lang"), col("doc_id"),
            explode(split(col("text"), " ")).as("token"))
          .groupBy("lang").agg(
            approx_count_distinct(col("token"), rsd = 0.02)
              .as("distinct_tokens"),
            approx_count_distinct(col("doc_id"), rsd = 0.02).as("n_docs_est"))
        val lengthQs = shuffled
          .select(col("lang"), size(split(col("text"), " ")).as("n_tok"))
          .groupBy("lang").agg(
            percentile_approx(col("n_tok"), lit(0.5), lit(10000))
              .as("p50_tokens_est"),
            percentile_approx(col("n_tok"), lit(0.9), lit(10000))
              .as("p90_tokens_est"))
        tokenCards.join(lengthQs, Seq("lang"))
      }.select("lang", "distinct_tokens", "n_docs_est",
          "p50_tokens_est", "p90_tokens_est")
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      assert(reshaped == once, s"parts=$parts differs from base run")
      assert(est.count() == once.size.toLong)
    }
  }
}
