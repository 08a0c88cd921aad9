package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoinRewrite end-to-end through a GraftExtensions session:
  * the naturally-written inequality join must (a) stop planning as
  * BroadcastNestedLoopJoin once the rule is enabled, (b) return
  * byte-identical results to the naive plan for every boundary
  * shape, and (c) leave equi-keyed and disabled joins untouched. */
class RangeJoinRewriteSpec extends AnyFunSuite {

  private def withExtSession(f: SparkSession => Unit): Unit = {
    val shared = SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      try f(s) finally s.conf.set("spark.graft.rangeJoin.bucketWidth", "0")
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  private def hasNestedLoop(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin")

  test("inequality join: rewritten plan loses the nested loop, keeps the answer") {
    withExtSession { s =>
      import s.implicits._
      val rnd = new scala.util.Random(7)
      val pts = (0 until 400).map(i => (i.toLong, rnd.nextInt(1000).toLong))
        .toDF("pid", "p")
      val ivs = (0 until 120).map { i =>
        val st = rnd.nextInt(1000).toLong - 20
        (1000L + i, st, st + rnd.nextInt(60))
      }.toDF("iid", "s", "e")

      def q() = pts.join(ivs, $"p" >= $"s" && $"p" < $"e")
        .select("pid", "iid")

      s.conf.set("spark.graft.rangeJoin.bucketWidth", "0")
      val naive = q()
      assert(hasNestedLoop(naive), "baseline must be the nested-loop fallback")
      val want = naive.as[(Long, Long)].collect().sorted.toSeq

      s.conf.set("spark.graft.rangeJoin.bucketWidth", "32")
      val rewritten = q()
      assert(!hasNestedLoop(rewritten), rewritten.queryExecution.executedPlan.toString)
      assert(rewritten.as[(Long, Long)].collect().sorted.toSeq == want)
    }
  }

  test("every boundary-openness combination survives the rewrite exactly") {
    withExtSession { s =>
      import s.implicits._
      // points on and around the interval edges; width chosen so edges
      // and bucket boundaries interact (24 and 48 divide by 8; 25 not)
      val pts = Seq(23L, 24L, 25L, 47L, 48L, 49L).zipWithIndex
        .map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
      val ivs = Seq((9000L, 24L, 48L)).toDF("iid", "s", "e")
      val combos = Seq[(String, org.apache.spark.sql.Column)](
        ("ge_lt", $"p" >= $"s" && $"p" < $"e"),
        ("gt_le", $"p" > $"s" && $"p" <= $"e"),
        ("ge_le", $"p" >= $"s" && $"p" <= $"e"),
        ("gt_lt", $"p" > $"s" && $"p" < $"e"),
        ("flipped", $"s" <= $"p" && $"e" > $"p"))
      combos.foreach { case (name, cond) =>
        s.conf.set("spark.graft.rangeJoin.bucketWidth", "0")
        val want = pts.join(ivs, cond).select("pid")
          .as[Long].collect().sorted.toSeq
        s.conf.set("spark.graft.rangeJoin.bucketWidth", "8")
        val df = pts.join(ivs, cond).select("pid")
        assert(!hasNestedLoop(df), name)
        assert(df.as[Long].collect().sorted.toSeq == want, name)
      }
      // inverted interval matches nothing after the rewrite either
      s.conf.set("spark.graft.rangeJoin.bucketWidth", "8")
      val inv = pts.join(Seq((1L, 48L, 24L)).toDF("iid", "s", "e"),
        $"p" >= $"s" && $"p" < $"e")
      assert(inv.count() == 0)
    }
  }

  test("equi-keyed range joins and other shapes are left alone") {
    withExtSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.rangeJoin.bucketWidth", "32")
      val a = Seq((1L, 1L, 10L)).toDF("k", "ka", "p")
      val b = Seq((1L, 1L, 5L, 15L)).toDF("kb", "k2", "s", "e")
      // an equality key exists -> Catalyst already has a shuffle key;
      // the rewrite must not fire (no _graft_ bucket attrs in the plan)
      val equi = a.join(b, $"ka" === $"k2" && $"p" >= $"s" && $"p" < $"e")
      assert(!equi.queryExecution.optimizedPlan.toString.contains("_graft_"))
      assert(equi.count() == 1)
      // one-sided bound only -> not a range join, untouched
      val half = a.join(b, $"p" >= $"s")
      assert(!half.queryExecution.optimizedPlan.toString.contains("_graft_"))
      assert(half.count() == 1)
    }
  }
}
