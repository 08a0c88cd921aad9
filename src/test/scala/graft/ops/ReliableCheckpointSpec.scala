package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r11 VERDICT #6: `spark.graft.checkpointDir` switches every
  * [[Checkpoints.pin]] from localCheckpoint (fast, but dead on
  * executor loss) to a reliable checkpoint in that directory. These
  * tests run each iterative op in BOTH modes and assert identical
  * results — the conf must change durability, never answers — and that
  * release() cleans the checkpoint dir so iterative ops don't leak one
  * snapshot per round onto the cluster filesystem. */
class ReliableCheckpointSpec extends SparkSpec {
  import spark.implicits._

  override def withFixture(test: NoArgTest) =
    try super.withFixture(test) finally Releases.drain()

  private def withReliable[A](f: java.nio.file.Path => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.conf.set("spark.graft.checkpointDir", dir.toString)
    try f(dir)
    finally {
      spark.conf.unset("spark.graft.checkpointDir")
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  // a 30-chain plus a triangle plus an isolated self-edge: multi-round
  // convergence in every op under test
  private def edges: DataFrame =
    ((0L until 30L).sliding(2).map(p => (p(0), p(1))).toSeq ++
      Seq((100L, 101L), (101L, 102L), (102L, 100L), (200L, 200L)))
      .toDF("src", "dst")

  private def both[A](run: => A): (A, A) = {
    val local = run
    val reliable = withReliable(_ => run)
    (local, reliable)
  }

  test("Components: identical labels under local and reliable modes") {
    def labels(): Set[(Long, Long)] = {
      val l = Components.run(edges)
      val got = l.components.as[(Long, Long)].collect().toSet
      l.release(); got
    }
    val (a, b) = both(labels())
    assert(a == b && a.nonEmpty)
  }

  test("Bfs: identical distances under local and reliable modes") {
    def dist(): Set[(Long, Long)] = {
      val d = Bfs.run(edges, Seq(0L).toDF("id"))
      val got = d.distances.as[(Long, Long)].collect().toSet
      d.release(); got
    }
    val (a, b) = both(dist())
    assert(a == b && a.size == 30)
  }

  test("Sssp: identical tiers under local and reliable modes") {
    def tiers(): Set[(Long, Long)] = {
      val d = Sssp.run(edges.withColumn("w", col("dst") % 3 + 1),
        Seq(0L).toDF("id"), rounds = 40)
      val got = d.distances.as[(Long, Long)].collect().toSet
      d.release(); got
    }
    val (a, b) = both(tiers())
    assert(a == b && a.size == 30)
  }

  test("ExactRank: identical ranks under local and reliable modes") {
    val df = (0 until 400)
      .map(i => (s"g${i % 3}", (i * 31 % 97).toLong, i.toLong))
      .toDF("lang", "score", "id")
    def rank(): Set[(String, Long, Long, Long)] = {
      val got = ExactRank.prefixSum(df, "lang",
          Seq(desc("score"), asc("id")), lit(1L))
        .select($"lang", $"id", $"cum", $"n")
        .as[(String, Long, Long, Long)].collect().toSet
      Releases.drain(); got
    }
    val (a, b) = both(rank())
    assert(a == b && a.size == 400)
  }

  test("multi-pass Ivf: identical assignments under both modes") {
    val vecs = (0 until 60)
      .map(i => (i.toLong, Array(i % 5 * 10f, (i % 7).toFloat)))
      .toDF("vec_id", "embedding")
    def assigns(): Set[(Long, Long)] = {
      val ix = Ivf.buildIndex(vecs, k = 4, iterations = 3)
      val got = ix.assignments.select($"vec_id", $"cell".cast("long"))
        .as[(Long, Long)].collect().toSet
      ix.release(); got
    }
    val (a, b) = both(assigns())
    assert(a == b && a.size == 60)
  }

  test("full queries match under reliable mode (fixpoint, ExactRank, Clean)") {
    // end-to-end: the three checkpoint-backed query families — the
    // Components fixpoint, an ExactRank rank pipeline, and the Clean
    // stage barriers — through the real SparkEntry surface at sf0.001
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("llm_cluster_fixpoint", "llm_ppl_buckets",
        "c8_minimize_services")) {
      def run(): Set[String] = {
        val got = graft.SparkEntry.queries(q)(spark, sf)
          .collect().map(_.mkString("|")).toSet
        Releases.drain(); got
      }
      val (a, b) = both(run())
      assert(a == b && a.nonEmpty, s"$q diverged under reliable checkpoints")
    }
  }

  test("nested pins are BOTH written in reliable mode (r12 ADVICE: lazy " +
      "checkpoint only covers the topmost marked RDD per job by default)") {
    withReliable { _ =>
      val p1 = Checkpoints.pin(spark.range(100).toDF("id")
        .withColumn("x", col("id") * 2))
      val p2 = Checkpoints.pin(p1.groupBy((col("x") % 10).as("b"))
        .agg(sum("id").as("s")))
      // one materializing job over p2; p1's snapshot is an ancestor
      p2.write.mode("overwrite").format("noop").save()
      def ckFile(df: DataFrame): Option[String] =
        df.queryExecution.analyzed match {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.getCheckpointFile
          case _ => None
        }
      assert(ckFile(p2).isDefined, "top pin was not checkpointed")
      assert(ckFile(p1).isDefined,
        "NESTED pin was not checkpointed — compute-once degraded to plan-cut-only")
      Checkpoints.release(p1, blocking = true)
      Checkpoints.release(p2, blocking = true)
    }
  }

  test("two sessions with different checkpoint dirs don't cross-write (lastDir race)") {
    // Same SparkContext, two sessions, two dirs: each pin must land in
    // the dir its OWN session conf names, even when calls interleave.
    val d1 = java.nio.file.Files.createTempDirectory("graft-ckpt-a")
    val d2 = java.nio.file.Files.createTempDirectory("graft-ckpt-b")
    val s1 = spark.newSession(); val s2 = spark.newSession()
    s1.conf.set("spark.graft.checkpointDir", d1.toString)
    s2.conf.set("spark.graft.checkpointDir", d2.toString)
    try {
      def files(p: java.nio.file.Path): Long =
        java.nio.file.Files.walk(p)
          .filter(q => java.nio.file.Files.isRegularFile(q)).count()
      val a = Checkpoints.pin(s1.range(50).toDF("id"), eager = true)
      val na = files(d1)
      val b = Checkpoints.pin(s2.range(50).toDF("id"), eager = true)
      val c = Checkpoints.pin(s1.range(60).toDF("id"), eager = true)
      assert(na > 0, "first session's pin wrote nothing to its dir")
      assert(files(d2) > 0, "second session's pin wrote nothing to its dir")
      assert(files(d1) > na, "first session's SECOND pin (after the other " +
        "session switched the context dir) did not return to its own dir")
      Seq(a, b, c).foreach(Checkpoints.release(_, blocking = true))
    } finally {
      s1.conf.unset("spark.graft.checkpointDir")
      s2.conf.unset("spark.graft.checkpointDir")
      org.apache.commons.io.FileUtils.deleteDirectory(d1.toFile)
      org.apache.commons.io.FileUtils.deleteDirectory(d2.toFile)
    }
  }

  test("release() deletes reliable-checkpoint files from the dir") {
    withReliable { dir =>
      val l = Components.run(edges)
      l.components.write.mode("overwrite").format("noop").save()
      l.release()
      Releases.drain()
      // only empty rdd-* skeletons (or nothing) may remain after the
      // final snapshots are released
      val stray = java.nio.file.Files.walk(dir)
        .filter(p => java.nio.file.Files.isRegularFile(p))
        .count()
      assert(stray == 0, s"$stray checkpoint files leaked in $dir")
    }
  }
}
