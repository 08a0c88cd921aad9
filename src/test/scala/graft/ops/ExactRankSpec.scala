package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** ops.ExactRank: range-partitioned rank/prefix-sum must equal the
  * single-window answer while spreading a dominant group across >1
  * range partition (the r10 VERDICT #1 scale contract). */
class ExactRankSpec extends SparkSpec {
  import spark.implicits._

  // prefixSum checkpoints its range-partitioned relation and defers the
  // release (caller-owned, like Components/Ivf) — drop the blocks after
  // every test's actions so the shared session stays clean
  override def withFixture(test: NoArgTest) =
    try super.withFixture(test) finally Releases.drain()

  /** (group, score, id) rows: one dominant group `aa` (90%) plus a
    * tail of small groups — the fixed-cardinality skew shape. */
  private def skewRows(n: Int): Seq[(String, Long, Long)] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val g = if (rnd.nextInt(10) < 9) "aa" else s"g${rnd.nextInt(3)}"
      (g, rnd.nextInt(1000).toLong, i.toLong)
    }
  }

  test("cum with unit weight equals row_number over the group window") {
    val df = skewRows(500).toDF("lang", "score", "id")
    val got = ExactRank.prefixSum(df, "lang",
        Seq(desc("score"), asc("id")), lit(1L))
      .select($"lang", $"id", $"cum", $"n")
      .as[(String, Long, Long, Long)].collect().toSet
    val w = Window.partitionBy("lang").orderBy(desc("score"), asc("id"))
    val want = df
      .withColumn("cum", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .select($"lang", $"id", $"cum", $"n")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("weighted prefix sum equals the running-total window") {
    val df = skewRows(400).toDF("lang", "n_tok", "id")
      .groupBy("lang", "n_tok").agg(count(lit(1)).as("c"))
    val got = ExactRank.prefixSum(df, "lang", Seq(asc("n_tok")), col("c"))
      .select($"lang", $"n_tok", $"cum", $"n")
      .as[(String, Long, Long, Long)].collect().toSet
    val w = Window.partitionBy("lang").orderBy("n_tok")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(Window.partitionBy("lang")))
      .select($"lang", $"n_tok", $"cum", $"n")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("a dominant group spans more than one range partition") {
    // THE scale property: with 8 shuffle partitions, the 90% group must
    // not funnel into a single task the way a partitionBy(lang) window
    // would — and ranks must still be exact.
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val df = skewRows(2000).toDF("lang", "score", "id")
      val ranked = ExactRank.prefixSum(df, "lang",
        Seq(desc("score"), asc("id")), lit(1L), keepPid = true)
      val pidSpread = ranked.where($"lang" === "aa")
        .agg(countDistinct($"_pid")).as[Long].head()
      assert(pidSpread > 1,
        s"dominant group sorted in one partition (pids = $pidSpread)")
      // exactness under the multi-partition split
      val got = ranked.where($"lang" === "aa").orderBy($"cum")
        .select($"id").as[Long].collect()
      val want = df.where($"lang" === "aa")
        .orderBy(desc("score"), asc("id")).select($"id").as[Long].collect()
      assert(got.sameElements(want))
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("NULL group rows are kept as their own group (window parity)") {
    // r11 ADVICE: a plain equi-join dropped NULL-group rows that
    // Window.partitionBy keeps as one partition. Mixed null/non-null
    // groups, unique tie-break id; null-safe offset join must rank the
    // NULL group exactly like the window does.
    val rows = (0 until 300).map { i =>
      (if (i % 3 == 0) null else s"g${i % 4}", (i * 37 % 100).toLong, i.toLong)
    }
    val df = rows.toDF("lang", "score", "id")
    val got = ExactRank.prefixSum(df, "lang", Seq(desc("score"), asc("id")), lit(1L))
      .select($"lang", $"id", $"cum", $"n")
      .as[(Option[String], Long, Long, Long)].collect().toSet
    val w = Window.partitionBy("lang").orderBy(desc("score"), asc("id"))
    val want = df
      .withColumn("cum", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .select($"lang", $"id", $"cum", $"n")
      .as[(Option[String], Long, Long, Long)].collect().toSet
    assert(got.count(_._1.isEmpty) == 100)
    assert(got == want)
  }

  test("NULL weights count as 0 instead of NPE-ing or dropping rows") {
    val df = Seq(("a", 1L, Some(5L)), ("a", 2L, None), ("a", 3L, Some(2L)),
      ("b", 1L, None), ("b", 2L, Some(7L)))
      .toDF("lang", "id", "wt")
    val got = ExactRank.prefixSum(df, "lang", Seq(asc("id")), col("wt"))
      .select($"lang", $"id", $"cum", $"n")
      .as[(String, Long, Long, Long)].collect().toSet
    // running-count semantics: null weight contributes 0 (scaladoc'd
    // divergence from a bare sum-window, which would emit NULL before
    // the first non-null weight)
    assert(got == Set(("a", 1L, 5L, 7L), ("a", 2L, 5L, 7L), ("a", 3L, 7L, 7L),
      ("b", 1L, 0L, 7L), ("b", 2L, 7L, 7L)))
  }

  test("rank-function arithmetic matches native windows on edge-size groups") {
    // groups of size 1..7: the ntile dealing rule (first n%k buckets
    // one bigger), the percent_rank n=1 zero, and the n<k unreachable
    // zero-divisor branch (ANSI mode would throw if it ever evaluated)
    val rows = (1 to 7).flatMap(size =>
      (0 until size).map(i => (s"g$size", (i * 13 % 7).toLong, i.toLong)))
    val df = rows.toDF("grp", "score", "id")
    val got = ExactRank.prefixSum(df, "grp", Seq(asc("score"), asc("id")), lit(1L))
      .select($"grp", $"id", $"cum",
        ExactRank.ntileExpr(4).as("nt"),
        ExactRank.percentRankExpr.as("pr"),
        ExactRank.cumeDistExpr.as("cd"))
      .as[(String, Long, Long, Long, Double, Double)].collect().toSet
    val w = Window.partitionBy("grp").orderBy(asc("score"), asc("id"))
    val want = df
      .withColumn("cum", row_number().over(w).cast("long"))
      .withColumn("nt", ntile(4).over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .select($"grp", $"id", $"cum", $"nt", $"pr", $"cd")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSet
    assert(got == want)
  }

  test("randomized parity with the window form (nulls, negatives, ties)") {
    // 8 seeded shapes × (group nullability, weight sign/nullability,
    // heavy ties in the order key): prefixSum must equal
    // sum(coalesce(w, 0)).over(window) — the documented running-count
    // contract — on every draw. Catches interactions the targeted
    // tests miss (e.g. a NULL group colliding with a range-partition
    // boundary on a tied order key).
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val n = 150 + rnd.nextInt(200)
      val rows = (0 until n).map { i =>
        val g = if (rnd.nextInt(5) == 0) null else s"g${rnd.nextInt(3)}"
        val w: java.lang.Long =
          if (rnd.nextInt(7) == 0) null
          else java.lang.Long.valueOf(rnd.nextInt(21) - 10L)
        (g, (rnd.nextInt(6)).toLong, w, i.toLong) // heavy order-key ties
      }
      val df = rows.toDF("grp", "ord", "w", "id")
      val got = ExactRank.prefixSum(df, "grp", Seq(asc("ord"), asc("id")), col("w"))
        .select($"grp", $"id", $"cum", $"n")
        .as[(Option[String], Long, Long, Long)].collect().toSet
      Releases.drain()
      val win = Window.partitionBy("grp").orderBy(asc("ord"), asc("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df
        .withColumn("cum", sum(coalesce($"w", lit(0L))).over(win))
        .withColumn("n", sum(coalesce($"w", lit(0L)))
          .over(Window.partitionBy("grp")))
        .select($"grp", $"id", $"cum", $"n")
        .as[(Option[String], Long, Long, Long)].collect().toSet
      assert(got == want, s"seed $seed diverged")
    }
  }

  test("empty input yields empty output with the cum/n columns") {
    val df = Seq.empty[(String, Long, Long)].toDF("lang", "score", "id")
    val out = ExactRank.prefixSum(df, "lang", Seq(asc("score")), lit(1L))
    assert(out.columns.toSet == Set("lang", "score", "id", "cum", "n"))
    assert(out.count() == 0)
  }
}
