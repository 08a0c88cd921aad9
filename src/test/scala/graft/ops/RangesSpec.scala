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

  test("overlap count property: sweep-line == brute force pair count (10 cases)") {
    val rnd = new scala.util.Random(41)
    (1 to 10).foreach { case_i =>
      // dense starts on a narrow domain so same-start ties, shared
      // endpoints (touch = no overlap), and degenerate intervals all
      // occur; a few keys so the per-key window partitioning is real
      val ivs = (0 until 1 + rnd.nextInt(40)).map { i =>
        val s = rnd.nextInt(20).toLong
        (i.toLong, rnd.nextInt(3).toLong, s, s + rnd.nextInt(8) - 2L)
      }
      val want = (for {
        (ida, ka, sa, ea) <- ivs if ea > sa
        (idb, kb, sb, eb) <- ivs if eb > sb
        if ka == kb && ida < idb && sa < eb && sb < ea
      } yield ka).groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val got = Ranges.intervalOverlapCount(
          ivs.toDF("id", "k", "s", "e"), Seq("k"), "s", "e")
        .where($"n_pairs" > 0)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"case $case_i ivs=$ivs")
    }
  }

  test("overlap count: touching intervals don't pair; 0-pair keys emitted") {
    // [0,5) and [5,9) touch (no pair); [0,5)+[3,7) overlap once
    val ivs = Seq((1L, 0L, 0L, 5L), (2L, 0L, 5L, 9L), (3L, 0L, 3L, 7L),
      (4L, 1L, 2L, 4L)).toDF("id", "k", "s", "e")
    val got = Ranges.intervalOverlapCount(ivs, Seq("k"), "s", "e")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 1L -> 0L)) // (1,3) and (2,3); key 1 alone
  }

  test("half-open boundaries: start included, end excluded") {
    val pts = Seq((1L, 10L), (2L, 20L)).toDF("pid", "p")
    val ivs = Seq((9L, 10L, 20L)).toDF("iid", "s", "e")
    val got = Ranges.pointInInterval(pts, "p", ivs, "s", "e", 7L)
      .select("pid").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }
}
