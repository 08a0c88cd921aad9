package graft.ops

import graft.SparkSpec

/** AsOf.backward against a driver-side brute-force reference, plus the
  * equal-timestamp edge the strict flag controls. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def brute(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, String)], strict: Boolean): Map[Long, Option[String]] =
    left.map { case (id, k, ts) =>
      val cands = right.filter { case (rk, rts, _) =>
        rk == k && (if (strict) rts < ts else rts <= ts) }
      // unique (key, ts) per generator ⇒ maxBy is deterministic
      id -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
    }.toMap

  test("property: agrees with driver-side brute force, inclusive and strict (8 cases)") {
    val rnd = new scala.util.Random(23)
    (1 to 8).foreach { case_i =>
      val l = (0 until rnd.nextInt(30)).map(i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong))
      // one right row per (key, ts): the operator's documented
      // determinism precondition
      val r = Seq.fill(rnd.nextInt(30))(
          (rnd.nextInt(5).toLong, rnd.nextInt(40).toLong))
        .distinct.map { case (k, ts) => (k, ts, s"p$k-$ts") }
      if (r.nonEmpty) {
        val lDf = l.toDF("id", "k", "ts")
        val rDf = r.toDF("k", "rts", "payload")
        for (strict <- Seq(false, true)) {
          val got = AsOf.backward(lDf, rDf, keys = Seq("k"),
              leftTs = "ts", rightTs = "rts", strict = strict)
            .select("id", "payload").as[(Long, Option[String])]
            .collect().toMap
          assert(got == brute(l, r, strict),
            s"case $case_i strict=$strict left=$l right=$r")
        }
      }
    }
  }

  test("equal timestamps: inclusive matches, strict looks past them") {
    val lDf = Seq((1L, 0L, 10L)).toDF("id", "k", "ts")
    val rDf = Seq((0L, 10L, "at"), (0L, 7L, "before")).toDF("k", "rts", "payload")
    def run(strict: Boolean) = AsOf.backward(lDf, rDf, Seq("k"), "ts", "rts", strict)
      .select("payload").as[String].collect().toSeq
    assert(run(strict = false) == Seq("at"))
    assert(run(strict = true) == Seq("before"))
  }

  test("forward: earliest at-or-after right row, strict looks past equal ts") {
    val rnd = new scala.util.Random(29)
    (1 to 4).foreach { case_i =>
      val l = (0 until rnd.nextInt(25)).map(i =>
        (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(40).toLong))
      val r = Seq.fill(rnd.nextInt(25))(
          (rnd.nextInt(4).toLong, rnd.nextInt(40).toLong))
        .distinct.map { case (k, ts) => (k, ts, s"p$k-$ts") }
      if (r.nonEmpty) {
        for (strict <- Seq(false, true)) {
          val want = l.map { case (id, k, ts) =>
            val cands = r.filter { case (rk, rts, _) =>
              rk == k && (if (strict) rts > ts else rts >= ts) }
            id -> (if (cands.isEmpty) None else Some(cands.minBy(_._2)._3))
          }.toMap
          val got = AsOf.forward(l.toDF("id", "k", "ts"),
              r.toDF("k", "rts", "payload"), Seq("k"), "ts", "rts", strict)
            .select("id", "payload").as[(Long, Option[String])]
            .collect().toMap
          assert(got == want, s"case $case_i strict=$strict")
        }
      }
    }
  }

  test("forward restores the left time column") {
    val lDf = Seq((1L, 0L, 10L)).toDF("id", "k", "ts")
    val rDf = Seq((0L, 12L, "next")).toDF("k", "rts", "payload")
    val got = AsOf.forward(lDf, rDf, Seq("k"), "ts", "rts")
      .select("id", "ts", "payload").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 10L, "next")))
  }

  test("left rows with no qualifying right row carry null payload") {
    val lDf = Seq((1L, 0L, 5L), (2L, 9L, 50L)).toDF("id", "k", "ts")
    val rDf = Seq((0L, 7L, "late")).toDF("k", "rts", "payload")
    val got = AsOf.backward(lDf, rDf, Seq("k"), "ts", "rts")
      .select("id", "payload").as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> None, 2L -> None))
  }
}
