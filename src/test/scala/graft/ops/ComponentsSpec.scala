package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixpoint connected components: converges past the 2-round inline
  * query's diameter-2 contract, releases its checkpoint blocks, and
  * refuses to return silently-partial clusters. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("diameter-4 chain converges to one component (needs >2 rounds)") {
    // a-b-c-d-e chain: min-label needs ~4 propagation rounds — the exact
    // case the inline 2-round llm_dedup_cluster form documents as out of
    // its contract
    val edges = Seq(("b", "a"), ("c", "b"), ("d", "c"), ("e", "d"),
      ("x", "y")) // second cluster, plus z isolated via self-edge
      .toDF("src", "dst")
      .unionByName(Seq(("z", "z")).toDF("src", "dst"))
    val got = Components.run(edges)
    val byId = got.components.as[(String, String)].collect().toMap
    assert(byId == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "e" -> "a", "x" -> "x", "y" -> "x", "z" -> "z"))
    assert(got.iterations > 2, s"chain must need >2 rounds, took ${got.iterations}")
    got.release()
  }

  test("agrees with the 2-round form on diameter-≤2 clusters") {
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("src", "dst")
    val got = Components.run(edges)
    val byId = got.components.as[(Long, Long)].collect().toMap
    assert(byId == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
    got.release()
  }

  test("pointer jumping: O(log d) rounds on a long chain, same labels") {
    // 48-node path, diameter 47: plain propagation needs ~47 rounds;
    // with the per-round label(label(v)) jump the effective distance
    // roughly doubles per round, so it must land well under half that.
    val edges = (1L until 48L).map(i => (i, i + 1)).toDF("src", "dst")
    val plain = Components.run(edges, maxIterations = 100, shortcut = false)
    val jumped = Components.run(edges, maxIterations = 100)
    val a = plain.components.as[(Long, Long)].collect().toMap
    val b = jumped.components.as[(Long, Long)].collect().toMap
    plain.release(); jumped.release()
    assert(a == b && a.values.forall(_ == 1L))
    assert(plain.iterations > 40, s"plain took ${plain.iterations}")
    assert(jumped.iterations < plain.iterations / 2,
      s"jump took ${jumped.iterations} vs plain ${plain.iterations}")
  }

  test("release() drops every checkpoint block; blocks stay bounded mid-run") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = (1L until 8L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Components.run(edges, maxIterations = 64)
    assert(got.components.where(col("component") === 1L).count() == 8)
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    // per-round releases keep the footprint at edge list + ≤2 label
    // snapshots no matter how many rounds ran
    assert(during.size <= 3, s"unreleased intermediate rounds: $during")
    got.release()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty, s"release() left persisted RDDs: $after")
  }

  test("property: agrees with driver-side union-find on random graphs (8 cases)") {
    val rnd = new scala.util.Random(17)
    (1 to 8).foreach { case_i =>
      val nV = 5 + rnd.nextInt(20)
      val nE = rnd.nextInt(nV * 2)
      val es = (1 to nE).map(_ => (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      // isolated vertices enter via self-edges, as llm_cluster_fixpoint does
      val all = es ++ (0L until nV.toLong).map(v => (v, v))
      // reference: plain union-find, then canonicalize each root to the
      // min vertex id of its component
      val parent = Array.tabulate(nV)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(ra) = rb
      }
      val minOfRoot = (0 until nV).groupBy(find).map { case (r, vs) => r -> vs.min.toLong }
      val want = (0 until nV).map(v => v.toLong -> minOfRoot(find(v))).toMap
      val got = Components.run(all.toDF("src", "dst"), maxIterations = 100)
      val gotMap = got.components.as[(Long, Long)].collect().toMap
      got.release()
      assert(gotMap == want, s"case $case_i: nV=$nV nE=$nE edges=$es")
    }
  }

  test("deferred release: successive query-path runs leave no net blocks") {
    // the llm_cluster_fixpoint contract: the query defers its release
    // handle to ops.Releases and the materializing caller drains AFTER
    // its action — two back-to-back runs must not grow the block
    // manager (a long-lived openLatestImport-style session would
    // otherwise accumulate one checkpointed snapshot per run)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    (1 to 2).foreach { _ =>
      val got = Components.run(Seq((1L, 2L), (2L, 3L), (9L, 9L)).toDF("src", "dst"))
      Releases.defer(got.release)
      got.components.write.mode("overwrite").format("noop").save()
      Releases.drain()
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"net block-manager growth across runs: $leaked")
  }

  test("non-convergence within maxIterations fails loudly") {
    val edges = Seq(("b", "a"), ("c", "b"), ("d", "c"), ("e", "d"))
      .toDF("src", "dst")
    intercept[IllegalStateException] {
      Components.run(edges, maxIterations = 2)
    }
  }
}
