package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import java.nio.file.attribute.FileTime
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming-at-scale probe (r13 VERDICT "Next round" #2): the
  * streaming operators are batch-equivalence-PROVEN at test scale
  * (StreamBatchEquivSpec) but had no measured sf1+ row. This main
  * replays an sf corpus through the ingest-time operators under
  * `Trigger.AvailableNow` and reports rows/s plus the state-store
  * footprint from the engine's own `StreamingQueryProgress` — the
  * numbers that back the "stateless scorer against a published model /
  * bounded dedup state" claims with throughput instead of argument.
  *
  * Protocol:
  *  - The corpus (documents.parquet, no event-time column in the
  *    testdata) gets a synthetic arrival time `ts = epoch + doc_id
  *    seconds` and is re-written as an N-file drop dir range-sorted by
  *    doc_id with strictly increasing mod times, so the file source's
  *    (modTime, path) ordering replays arrival in event-time order —
  *    micro-batches see a moving event-time window exactly as a real
  *    ingest tail would, and watermark eviction is observable.
  *  - Two staggered far-future "flush" docs ride at the end (own
  *    files, latest mod times): the final micro-batch then runs with
  *    the watermark beyond every real doc, so append-mode
  *    aggregations (lmScoreStreamJoin) emit ALL per-doc rows before
  *    AvailableNow terminates instead of stranding the tail in state.
  *    The flush text must be ≥2 tokens — Catalyst pushes the scorer's
  *    deterministic token filter below EventTimeWatermark, so a
  *    1-token doc never reaches the event-time collector and cannot
  *    advance the watermark (measured). Flush ids sit above the
  *    corpus max doc_id and are excluded from rows-out counts.
  *  - Wall time is measured around the replay only (drop-dir prep and
  *    model publication are outside the window); each op also reports
  *    rows written to its parquet sink and the max state rows/bytes
  *    across batches. Batch counterparts run on the same session and
  *    corpus (steady = 2nd run) for the side-by-side.
  *
  * Usage: StreamBench <sfDir> [outJson]   (env SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_CODEGEN_CACHE, SPARK_GRAFT_STREAM_FILES as knobs). */
object StreamBench {

  private val docSchema = StructType(Seq(
    StructField("ts", TimestampType), StructField("doc_id", LongType),
    StructField("text", StringType), StructField("lang", StringType),
    StructField("source", StringType), StructField("n_chars", LongType)))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outJson = args.lift(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = graft.ops.ShuffleWidth.forDir(sfDir, cpus.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "2048"))
      // broadcast build side may be a corpus-scale aggregation (lmScore
      // c2 model) — the 300 s default await assumes a scan (see Bench)
      .config("spark.sql.broadcastTimeout", "3600")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- drop-dir prep (untimed): arrival order = event-time order --
    val work = Files.createTempDirectory("streambench")
    val dropDir = work.resolve("drop")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES",
      math.max(8L, nDocs / 50000L).toString).toInt
    val epoch = 1704067200L // 2024-01-01 00:00:00 UTC
    docs
      .withColumn("ts", timestamp_seconds(lit(epoch) + col("doc_id")))
      .select("ts", "doc_id", "text", "lang", "source", "n_chars")
      .repartitionByRange(nFiles, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(dropDir.toString)
    // (modTime, path) replay order: the part files land range-sorted by
    // doc_id under part NUMBER order, but their write-completion mod
    // times are NOT monotone in part number (tasks finish out of order;
    // at sf10 a high-range file getting an earlier mtime put its max ts
    // into batch 1, jumped the watermark to the corpus tail, and every
    // lower-ts doc arriving later was dropped as late — measured, the
    // sink lost the first ~29% of ids). Stamp strictly increasing mod
    // times in part-number order so replay order IS event-time order;
    // flush files get later mtimes still, landing in the final batches.
    val baseMs = System.currentTimeMillis()
    val dataParts = Files.list(dropDir).iterator().asScala.toSeq
      .filter(_.toString.endsWith(".parquet")).sortBy(_.getFileName.toString)
    dataParts.zipWithIndex.foreach { case (p, i) =>
      Files.setLastModifiedTime(p, FileTime.fromMillis(baseMs + 1000L * i))
    }
    // Flush ids/event-times derive from the corpus range: ids above
    // every real doc (real ids reach ~1e9 at sf10 — a constant would
    // collide), event time past every real ts so the final batches run
    // with the watermark beyond the whole corpus.
    import spark.implicits._
    Seq(0, 1).foreach { k =>
      val one = work.resolve(s"flush$k")
      Seq((new java.sql.Timestamp((epoch + maxId + 86400L * (k + 1)) * 1000L),
          maxId + 10L + k, "flush flush", "en", "s", 11L))
        .toDF("ts", "doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(one.toString)
      val part = Files.list(one).iterator()
      var src: Path = null
      while (part.hasNext) {
        val p = part.next()
        if (p.toString.endsWith(".parquet")) src = p
      }
      val dst = dropDir.resolve(f"zz-flush-$k.parquet")
      Files.copy(src, dst)
      // anchor past the LAST data mtime, not "now": with many part
      // files the stamped ladder extends minutes past baseMs, and a
      // now-relative flush mtime lands MID-replay — its far-future
      // event time then jumps the watermark past the whole corpus and
      // every later-replayed doc is dropped as late (measured at 100
      // files: only the first ~62 files' docs survived).
      Files.setLastModifiedTime(dst, FileTime.fromMillis(
        baseMs + 1000L * dataParts.size + 60000L * (k + 1)))
    }

    def stream(maxFiles: Int): DataFrame =
      spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", maxFiles.toString)
        .parquet(dropDir.toString)

    final case class OpResult(name: String, wallSec: Double, rowsIn: Long,
        rowsOut: Long, rowsPerSec: Double, batches: Int,
        maxStateRows: Long, maxStateBytes: Long)

    def runOp(name: String, out: DataFrame): OpResult = {
      val sink = work.resolve(s"sink_$name").toString
      val ckpt = work.resolve(s"ckpt_$name").toString
      val t0 = System.nanoTime()
      val q = out.writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.toSeq
      val rowsIn = progress.map(_.numInputRows).sum
      val stateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
      val stateBytes = progress.flatMap(_.stateOperators.map(_.memoryUsedBytes))
      val rowsOut = spark.read.parquet(sink)
        .where(col("doc_id") <= maxId).count()
      val r = OpResult(name, wall, rowsIn, rowsOut, rowsIn / wall,
        progress.count(_.numInputRows > 0),
        if (stateRows.isEmpty) 0L else stateRows.max,
        if (stateBytes.isEmpty) 0L else stateBytes.max)
      println(f"[streambench] ${r.name}%-24s wall=${r.wallSec}%7.2fs " +
        f"in=${r.rowsIn}%9d out=${r.rowsOut}%9d rows/s=${r.rowsPerSec}%10.0f " +
        f"batches=${r.batches}%3d stateRows=${r.maxStateRows}%9d " +
        f"stateMB=${r.maxStateBytes / 1e6}%8.1f")
      r
    }

    def timedBatch(name: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(); val s = once() // steady = 2nd run
      println(f"[streambench] batch $name%-18s steady=${s}%6.2fs")
      s
    }

    // ---- the probes ------------------------------------------------
    // maxFilesPerTrigger=2: data replays in nFiles/2 micro-batches and
    // the two flush files land in separate final batches, so the last
    // flush batch runs with the watermark already past every real doc.
    // Dedup: 15-min horizon over the 1-doc/s synthetic arrival ⇒ state
    // holds ~900 in-horizon digests per batch tail, NOT the corpus —
    // the bounded-state contract, observable in maxStateRows.
    val dedup = runOp("dedupDocStream",
      graft.streaming.Streams.dedupDocStream(stream(2), "15 minutes"))
    // LM scorer, big-model path: model published by the batch pass
    // (untimed — it is the batch op's output), stream scores against it
    // via stream-static equi joins + watermarked re-aggregation.
    val (c2, c1, v) = graft.queries.LlmOps.lmModel(docs)
    c2.persist(); c1.persist(); c2.count(); c1.count()
    val lmJoin = runOp("lmScoreStreamJoin",
      graft.streaming.Streams.lmScoreStreamJoin(
        stream(2), c2, c1, v, "15 minutes"))
    val results = Seq(dedup, lmJoin)

    val batchDedup = timedBatch("llm_dedup_exact")
    val batchLm = timedBatch("llm_lm_score")

    val json = {
      val ops = results.map { r =>
        f"""  "${r.name}": {"wall_sec": ${r.wallSec}%.2f, "rows_in": ${r.rowsIn},
           |   "rows_out": ${r.rowsOut}, "rows_per_sec": ${r.rowsPerSec}%.0f,
           |   "batches": ${r.batches}, "max_state_rows": ${r.maxStateRows},
           |   "max_state_bytes": ${r.maxStateBytes}}""".stripMargin
      }.mkString(",\n")
      s"""{"sf": "$sfDir", "n_docs": $nDocs, "n_files": $nFiles,
         | "protocol": "AvailableNow replay, maxFilesPerTrigger=2, ts=epoch+doc_id sec, watermark=15 min, 2 staggered flush docs drain append-mode state; state metrics from StreamingQueryProgress",
         | "batch_steady_sec": {"llm_dedup_exact": $batchDedup, "llm_lm_score": $batchLm},
         |$ops
         |}""".stripMargin
    }
    println(json)
    outJson.foreach(p => Files.writeString(Paths.get(p), json))
    spark.stop()
  }
}
