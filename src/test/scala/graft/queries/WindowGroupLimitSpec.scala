package graft.queries

import graft.SparkSpec

/** Plan contract (r11 VERDICT #8): the two top-k-by-window queries
  * claim O(k) per-partition window state because Catalyst pushes their
  * `row_number() <= k` / `rn = 1` filters into a WindowGroupLimit
  * below the full sort. That pushdown is an optimizer behavior, not an
  * API guarantee — a Spark upgrade could silently regress them to
  * full-partition window state with no correctness signal. Pin it. */
class WindowGroupLimitSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString()

  test("llm_top_tokens plans a WindowGroupLimit below the rank filter") {
    assert(plan("llm_top_tokens").contains("WindowGroupLimit"))
  }

  test("q13_cdc_merge plans a WindowGroupLimit for last-writer-wins") {
    assert(plan("q13_cdc_merge").contains("WindowGroupLimit"))
  }
}
