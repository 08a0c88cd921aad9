package graft.ops

import graft.SparkSpec

/** Ranges.pointInInterval against a driver-side brute force, the
  * half-open boundary, and the zero-crossing bucket monotonicity the
  * scaladoc claims. */
class RangesSpec extends SparkSpec {
  import spark.implicits._

  test("property: matches brute force across widths, incl. negatives (8 cases)") {
    val rnd = new scala.util.Random(31)
    (1 to 8).foreach { case_i =>
      val pts = (0 until 1 + rnd.nextInt(25)).map(i =>
        (i.toLong, rnd.nextInt(60).toLong - 30L))
      val ivs = (0 until 1 + rnd.nextInt(25)).map { i =>
        val s = rnd.nextInt(60).toLong - 30L
        (1000L + i, s, s + rnd.nextInt(15) - 2L) // some degenerate (e <= s)
      }
      val width = 1L + rnd.nextInt(9)
      val want = (for {
        (pid, p) <- pts
        (iid, s, e) <- ivs if s <= p && p < e
      } yield (pid, iid)).toSet
      val got = Ranges.pointInInterval(
          pts.toDF("pid", "p"), "p", ivs.toDF("iid", "s", "e"), "s", "e", width)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == want, s"case $case_i width=$width pts=$pts ivs=$ivs")
    }
  }

  test("overlap property: matches brute force exactly-once, keyed (8 cases)") {
    val rnd = new scala.util.Random(37)
    (1 to 8).foreach { case_i =>
      def mk(n: Int, idBase: Long) = (0 until n).map { i =>
        val s = rnd.nextInt(50).toLong - 25L
        (idBase + i, rnd.nextInt(3).toLong, s, s + rnd.nextInt(14) - 2L)
      }
      val as = mk(1 + rnd.nextInt(20), 0L)
      val bs = mk(1 + rnd.nextInt(20), 1000L)
      val width = 1L + rnd.nextInt(9)
      val want = (for {
        (ida, ka, sa, ea) <- as if ea > sa
        (idb, kb, sb, eb) <- bs if eb > sb
        if ka == kb && sa < eb && sb < ea
      } yield (ida, idb)).toList.sorted
      // a LIST compare (not a set): duplicates from multi-bucket pairs
      // would be visible here
      val got = Ranges.intervalOverlap(
          as.toDF("ida", "k", "sa", "ea"), bs.toDF("idb", "k", "sb", "eb"),
          Seq("k"), "sa", "ea", "sb", "eb", width)
        .select("ida", "idb").as[(Long, Long)].collect().toList.sorted
      assert(got == want, s"case $case_i width=$width")
    }
  }

  test("half-open boundaries: start included, end excluded") {
    val pts = Seq((1L, 10L), (2L, 20L)).toDF("pid", "p")
    val ivs = Seq((9L, 10L, 20L)).toDF("iid", "s", "e")
    val got = Ranges.pointInInterval(pts, "p", ivs, "s", "e", 7L)
      .select("pid").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }
}
