package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bounded Bellman-Ford: exact ≤k-hop cheapest costs, BFS degeneration
  * at unit weights, early-exit idempotence, block hygiene, and a
  * brute-force property check. */
class SsspSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String, Long)], seeds: Seq[String],
      rounds: Int): (Map[String, Long], Int) = {
    val got = Sssp.run(edges.toDF("src", "dst", "w"), seeds.toDF("id"), rounds)
    val m = got.distances.as[(String, Long)].collect().toMap
    got.release()
    (m, got.iterations)
  }

  /** Reference: dense bounded relaxation over the symmetrized list. */
  private def brute(edges: Seq[(String, String, Long)], seeds: Seq[String],
      rounds: Int): Map[String, Long] = {
    val sym = edges ++ edges.map { case (a, b, w) => (b, a, w) }
    var d = seeds.map(_ -> 0L).toMap
    (1 to rounds).foreach { _ =>
      val relaxed = sym.flatMap { case (a, b, w) =>
        d.get(a).map(da => b -> (da + w)) }
      d = (d.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).min }
    }
    d
  }

  test("cheap long path beats expensive direct edge") {
    // s→t direct costs 10; s→a→b→t costs 3 — needs 3 rounds to win
    val es = Seq(("s", "t", 10L), ("s", "a", 1L), ("a", "b", 1L), ("b", "t", 1L))
    val (m1, _) = run(es, Seq("s"), rounds = 1)
    assert(m1("t") == 10L) // only the direct edge is within 1 hop
    val (m3, _) = run(es, Seq("s"), rounds = 3)
    assert(m3 == Map("s" -> 0L, "a" -> 1L, "b" -> 2L, "t" -> 3L))
  }

  test("unit weights degenerate to BFS hop distances") {
    val es = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"))
    val (sssp, _) = run(es.map { case (u, v) => (u, v, 1L) }, Seq("a"), 10)
    val bfs = Bfs.run(es.toDF("src", "dst"), Seq("a").toDF("id"))
    val bfsMap = bfs.distances.as[(String, Long)].collect().toMap
    bfs.release()
    assert(sssp == bfsMap && sssp == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
  }

  test("early exit is idempotent: converged result equals the full bound") {
    val es = Seq(("s", "a", 2L), ("a", "b", 2L), ("s", "b", 5L))
    val (m, iters) = run(es, Seq("s"), rounds = 12)
    assert(iters < 12, s"tiny graph must converge early, ran $iters")
    assert(m == brute(es, Seq("s"), 12))
  }

  test("parallel edges keep the cheapest; multi-source takes the min") {
    val es = Seq(("a", "b", 7L), ("a", "b", 2L), ("b", "c", 1L))
    val (m, _) = run(es, Seq("a", "c"), rounds = 5)
    // b: min(via seed a = 2, via seed c = 1) = 1
    assert(m == Map("a" -> 0L, "b" -> 1L, "c" -> 0L))
  }

  test("release() drops every checkpoint block") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = Sssp.run(
      (1L until 6L).map(i => (i, i + 1, i)).toDF("src", "dst", "w"),
      Seq(1L).toDF("id"), rounds = 8)
    assert(got.distances.count() == 6)
    got.release()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty, s"release() left persisted RDDs: $after")
  }

  test("property: agrees with brute bounded relaxation on random graphs (8 cases)") {
    val rnd = new scala.util.Random(31)
    (1 to 8).foreach { case_i =>
      val nV = 4 + rnd.nextInt(12)
      val nE = rnd.nextInt(nV * 2)
      val es = (1 to nE).map(_ => (s"n${rnd.nextInt(nV)}", s"n${rnd.nextInt(nV)}",
        rnd.nextInt(9).toLong))
      val seeds = (0 until 1 + rnd.nextInt(2)).map(_ => s"n${rnd.nextInt(nV)}").distinct
      val rounds = 1 + rnd.nextInt(6)
      val (got, _) = run(es, seeds, rounds)
      val want = brute(es, seeds, rounds)
      assert(got == want,
        s"case $case_i: rounds=$rounds seeds=$seeds edges=$es")
    }
  }
}
