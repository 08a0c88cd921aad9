package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract). Runs every query in
  * `SparkEntry.queries` against $SPARK_GRAFT_SF_DIR and prints ONE JSON
  * line. Fixes from round-1 VERDICT:
  *   - results are written to the `noop` sink, not `.count()`ed, so
  *     Catalyst cannot prune away the projected work being measured;
  *   - an untimed warmup query absorbs first-query session/codegen cost;
  *   - failures surface as negative per-query values plus a "failures"
  *     list instead of being swallowed as fast successes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()

    // Warmup, untimed: exercise the operator code paths the measured
    // queries share — scan+hash agg, broadcast join, window, object
    // hash agg (collect_list), semi join — on the 25-row nation table.
    // This moves Janino's own JIT warmup and the first compile of each
    // generated-code shape out of the first measured queries (the
    // alphabetically-first c1x block otherwise absorbs it).
    try {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      run((s, d) => Tables.nation(s, d).groupBy("n_regionkey").count())
      run((s, d) => {
        val n = Tables.nation(s, d)
        val w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
        n.join(broadcast(Tables.region(s, d)),
            col("n_regionkey") === col("r_regionkey"))
          .join(n.select(col("n_nationkey").as("k")),
            col("n_nationkey") === col("k"), "left_semi")
          .withColumn("rn", row_number().over(w))
          .groupBy("n_regionkey")
          .agg(collect_list(struct(col("rn"), col("n_name"))).as("xs"),
            min(struct(col("rn"), col("n_nationkey"))).as("m"))
      })
      // hash/explode/window shapes the document queries compile
      run((s, d) => {
        val w = Window.partitionBy("n_regionkey").orderBy("pos")
          .rowsBetween(-3, 0)
        Tables.nation(s, d)
          .select(col("n_regionkey"),
            posexplode(split(col("n_name"), "")).as(Seq("pos", "ch")))
          .repartition(col("n_regionkey"), col("ch"))
          .withColumn("wm",
            min(conv(substring(sha2(col("ch"), 256), 1, 8), 16, 10)
              .cast("long")).over(w))
          .groupBy("n_regionkey")
          .agg(array_sort(collect_set(col("wm"))).as("s"),
            min(conv(substring(sha2(col("ch"), 256), 9, 8), 16, 10)
              .cast("long")).as("m"))
      })
    } catch { case _: Throwable => () }

    var failures = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { run(fn); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failures ::= name; false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -sec)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fj = failures.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fj,"sf":"$sfDir"}""")
    spark.stop()
  }
}
