package graft

import org.apache.spark.sql.SparkSession

/** Timing probe: runs each named query `iters` times (noop sink, like
  * Bench) and prints every iteration's seconds. Iteration 1 minus the
  * steady-state tail isolates the fixed planning/codegen cost from the
  * repeatable data-path cost — the split that decides whether a slow
  * bench row needs a better plan or is pure per-query overhead.
  *
  * Run: sbt "runMain graft.Probe <sfDir> <iters> <query ...>" */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Local analog of sizing shuffle width to the data (SCALE.md): a
    // cluster deployment sets spark.sql.shuffle.partitions ∝ input
    // size / target partition bytes; the sf10+ probes use this to
    // separate "plan grows super-linearly" from "32 fixed partitions
    // spill at this input size". Default = cpus, the bench shape.
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Same untimed warmup as Bench, so probe numbers are comparable to
    // bench rows (first-iteration cost = plan + any shape NOT warmed).
    Warmup.run(spark, sfDir)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.ops.Releases.drain() // untimed, like Bench
        System.gc()                // untimed, like Bench (spike hygiene)
        sec
      }
      println(f"$n%-28s ${ts.map(t => f"$t%6.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
