package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Frontier BFS: exact hop distances (single- and multi-source),
  * unreachable exclusion, checkpoint-block hygiene, and a brute-force
  * property check against driver-side BFS. */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def dists(edges: Seq[(String, String)], seeds: Seq[String],
      maxIter: Int = 50): (Map[String, Long], Int) = {
    val got = Bfs.run(edges.toDF("src", "dst"), seeds.toDF("id"), maxIter)
    val m = got.distances.as[(String, Long)].collect().toMap
    got.release()
    (m, got.iterations)
  }

  test("path graph from one end: distance = position") {
    // a-b-c-d-e; edge direction must not matter (symmetrized)
    val (m, iters) = dists(
      Seq(("a", "b"), ("c", "b"), ("c", "d"), ("e", "d")), Seq("a"))
    assert(m == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L, "e" -> 4L))
    assert(iters == 5, s"4 expansion rounds + 1 empty, got $iters")
  }

  test("multi-source takes the min over seeds; unreachable nodes absent") {
    //  a-b-c-d-e  seeded at a and e → middle node c at distance 2
    //  x-y        disconnected, never discovered
    val (m, _) = dists(
      Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")),
      Seq("a", "e"))
    assert(m == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 1L, "e" -> 0L))
  }

  test("duplicate seeds and seeds outside the graph are tolerated") {
    val (m, _) = dists(Seq(("a", "b")), Seq("a", "a", "ghost"))
    assert(m == Map("a" -> 0L, "b" -> 1L, "ghost" -> 0L))
  }

  test("multi-path discovery in the same round keeps one row") {
    // diamond: s-l, s-r, l-t, r-t → t found twice in round 2
    val (m, _) = dists(Seq(("s", "l"), ("s", "r"), ("l", "t"), ("r", "t")),
      Seq("s"))
    assert(m == Map("s" -> 0L, "l" -> 1L, "r" -> 1L, "t" -> 2L))
  }

  test("throws when the frontier outlives maxIterations") {
    val chain = (0 until 6).map(i => (s"n$i", s"n${i + 1}"))
    intercept[IllegalStateException] {
      dists(chain, Seq("n0"), maxIter = 3)
    }
  }

  test("deep path: chain of 100 completes with constant-width settle") {
    // the r10 settle shape unioned every prior layer checkpoint — at
    // 100 rounds that plan is 100 branches wide; the folded single
    // settled snapshot must stay one branch at any depth. Correctness
    // on a maximal-eccentricity graph: distance = chain position.
    val chain = (0L until 100L).map(i => (i, i + 1))
    val got = Bfs.run(chain.toDF("src", "dst"), Seq(0L).toDF("id"),
      maxIterations = 120)
    val m = got.distances.as[(Long, Long)].collect().toMap
    got.release()
    assert(got.iterations == 101, s"100 expansions + 1 empty, got ${got.iterations}")
    assert(m == (0L to 100L).map(i => i -> i).toMap)
  }

  test("release() drops every checkpoint block") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = Bfs.run(
      (1L until 8L).map(i => (i, i + 1)).toDF("src", "dst"),
      Seq(1L).toDF("id"))
    assert(got.distances.count() == 8)
    got.release()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty, s"release() left persisted RDDs: $after")
  }

  test("property: agrees with driver-side BFS on random graphs (8 cases)") {
    val rnd = new scala.util.Random(23)
    (1 to 8).foreach { case_i =>
      val nV = 5 + rnd.nextInt(20)
      val nE = rnd.nextInt(nV * 2)
      val es = (1 to nE).map(_ => (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      val seeds = (0 until 1 + rnd.nextInt(3)).map(_ => rnd.nextInt(nV).toLong).distinct
      // reference: queue BFS over the symmetrized adjacency
      val adj = (es ++ es.map(_.swap)).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).toSet }
      val want = scala.collection.mutable.Map[Long, Long]()
      var frontier = seeds.toSet
      frontier.foreach(s => want(s) = 0L)
      var d = 0L
      while (frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .filterNot(want.contains)
        frontier.foreach(v => want(v) = d)
      }
      val got = Bfs.run(es.toDF("src", "dst"), seeds.toDF("id"),
        maxIterations = 100)
      val gotMap = got.distances.as[(Long, Long)].collect().toMap
      got.release()
      assert(gotMap == want.toMap,
        s"case $case_i: nV=$nV nE=$nE seeds=$seeds edges=$es")
    }
  }
}
