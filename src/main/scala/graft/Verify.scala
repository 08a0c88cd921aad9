package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Current git HEAD, resolved by file read (no git exec, no JNI):
    * `.git/HEAD` is either a detached sha or `ref: <path>`; symbolic
    * refs may live loose under `.git/<path>` or only in
    * `.git/packed-refs`. Best-effort — "unknown" if the layout is
    * anything else (worktrees, shallow mirrors). */
  private def buildCommit: String = try {
    val head = Files.readString(Paths.get(".git/HEAD")).trim
    if (!head.startsWith("ref: ")) head
    else {
      val ref = head.stripPrefix("ref: ")
      val loose = Paths.get(s".git/$ref")
      if (Files.exists(loose)) Files.readString(loose).trim
      else Files.readAllLines(Paths.get(".git/packed-refs")).stream()
        .filter(l => l.endsWith(" " + ref)).findFirst()
        .map[String](_.split(" ")(0)).orElse("unknown")
    }
  } catch { case _: Exception => "unknown" }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg: regex over query names, for fast local iteration
    // on a subset (driver always calls with two args = run everything).
    val nameFilter = args.lift(2).map(_.r)
    def selected(name: String): Boolean =
      nameFilter.forall(_.findFirstIn(name).isDefined)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Input-sized shuffle width (r12 VERDICT #1) — same derivation as
    // Bench, so correctness runs exercise the width the bench uses.
    val parts = graft.ops.ShuffleWidth.forDir(sfDir, cpus.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // codegen class cache sized to the query suite (see Bench.scala);
      // env-overridable so knob experiments reproduce through any entry
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "2048"))
      // broadcast build side may be a corpus-scale aggregation (lmScore
      // c2 model) — the 300 s default await assumes a scan (see Bench)
      .config("spark.sql.broadcastTimeout", "3600")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Machine-readable protocol stamp (r13 VERDICT #7): the knobs that
    // shaped this run, so CORRECTNESS artifacts are self-describing —
    // the compare tools merge these fields into their `_meta`.
    Files.writeString(Paths.get(s"$outDir/run_meta.json"),
      s"""{"sf_dir": "$sfDir", "cpus": $cpus, "shuffle_partitions": $parts,
         | "codegen_cache_max_entries": ${spark.conf.get("spark.sql.codegen.cache.maxEntries")},
         | "spark_version": "${spark.version}",
         | "build_commit": "$buildCommit"}""".stripMargin)
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        // release checkpoint blocks the query deferred (caller-owned:
        // only after the write has materialized the result)
        graft.ops.Releases.drain()
      }
    }
    // JSON string escape (shared ops.JsonOut) — a tab or CR in
    // builder-authored SQL would otherwise make the driver's json.load
    // fail and silently zero the round's correctness.
    import graft.ops.JsonOut.q
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
