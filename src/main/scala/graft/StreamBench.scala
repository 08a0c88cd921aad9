package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using
import java.nio.file.attribute.FileTime
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import org.apache.spark.sql.types._

/** Streaming-at-scale probe (r13 VERDICT "Next round" #2): the
  * streaming operators are batch-equivalence-PROVEN at test scale
  * (StreamBatchEquivSpec) but had no measured sf1+ row. This main
  * replays an sf corpus through the ingest-time operators under
  * `Trigger.AvailableNow` and reports rows/s plus the state-store
  * footprint — the numbers that back the "stateless scorer against a
  * published model / bounded dedup state" claims with throughput
  * instead of argument.
  *
  * Round-15 additions (r14 VERDICT #2/#3 + ADVICE):
  *  - progress is accumulated by a [[StreamingQueryListener]], not read
  *    back from `q.recentProgress` — that is a ring buffer capped at
  *    `spark.sql.streaming.numRecentProgressUpdates` (100), which the
  *    sf10 fine replay already brushed at 51 batches; an sf100 replay
  *    would silently undercount every progress-derived metric.
  *  - the minhash-LSH candidate stream gets measured rows: at two
  *    watermark horizons (state must scale with the HORIZON, not the
  *    corpus) and at a horizon past the whole corpus span (where the
  *    emitted anchor-star pair set is EXACTLY batch-replayable on the
  *    shared [[graft.streaming.Streams.bandedDocs]] projection — both
  *    sides reduced to count + an order-independent hash sum, nothing
  *    collected).
  *  - a `spark.sql.streaming.stateStore.providerClass` gate: the
  *    default HDFSBackedStateStoreProvider holds all state in executor
  *    heap — fine at MBs, the scale-killer when the horizon holds
  *    millions of entries. The LSH horizon op re-runs under
  *    RocksDBStateStoreProvider and must produce the identical pair
  *    set (same deterministic replay ⇒ same batches ⇒ same evictions);
  *    the artifact carries both providers' state bytes + post-GC heap.
  *
  * Protocol (unchanged from r14 where not noted above):
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
  *    corpus max doc_id and are excluded from rows-out counts (and
  *    from LSH pair counts/hashes, on BOTH pair endpoints' id).
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

  private val HdfsProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Accumulates StreamingQueryProgress per query id for the query's
    * WHOLE life — `q.recentProgress` is a ring buffer (default cap 100
    * updates) and undercounts long replays (r14 ADVICE). Events arrive
    * async on the listener bus, so readers must [[awaitTerminated]]
    * before trusting the totals. */
  private final class ProgressAcc extends StreamingQueryListener {
    final class Acc {
      var rowsIn = 0L; var batches = 0
      var maxStateRows = 0L; var maxStateBytes = 0L
      @volatile var terminated = false
    }
    private val byQuery =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, Acc]()
    private def acc(id: java.util.UUID): Acc =
      byQuery.computeIfAbsent(id, _ => new Acc)
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = { acc(e.id); () }
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val a = acc(e.progress.id)
      a.synchronized {
        a.rowsIn += e.progress.numInputRows
        if (e.progress.numInputRows > 0) a.batches += 1
        e.progress.stateOperators.foreach { s =>
          a.maxStateRows = math.max(a.maxStateRows, s.numRowsTotal)
          a.maxStateBytes = math.max(a.maxStateBytes, s.memoryUsedBytes)
        }
      }
    }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      acc(e.id).terminated = true
    /** Wait (bounded) for the bus to drain this query's events; the
      * terminated event is ordered after its final progress event. */
    def awaitTerminated(id: java.util.UUID, maxMs: Long = 15000): Acc = {
      val a = acc(id)
      val deadline = System.nanoTime() + maxMs * 1000000L
      while (!a.terminated && System.nanoTime() < deadline) Thread.sleep(50)
      a
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outJson = args.lift(1)
    // "lshdecomp" runs the banding/state decomposition arms instead of
    // the full suite (round-16: attribute the LSH stream's wall between
    // the banding projection and the stateful operator by A/B).
    // "lsh" (r18, the sf1000 decade) runs ONLY the LSH arms — h900
    // hdfs, h900 rocksdb, full-horizon — with the FULL-horizon arm
    // under RocksDB: at 50 M docs the corpus-span state (every (band,
    // bucket) anchor) no longer belongs in executor heap, which is
    // exactly the provider story the decade is meant to measure.
    val mode = args.lift(2).getOrElse("full")
    val liteLsh = mode == "lsh"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Width derives from the TABLE SUBSET this workload reads (only
    // documents.parquet), not the whole directory (r16 VERDICT #7):
    // a documents-only replay dir and a mixed dir now derive the SAME
    // width for the same corpus, so cross-round artifacts compare
    // without hand-pinning SPARK_GRAFT_SHUFFLE_PARTS (the env
    // override remains honored for experiments; the derived/pinned
    // value is recorded in the artifact as "shuffle_partitions").
    val parts = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTS").map(_.toInt)
      .getOrElse(graft.ops.ShuffleWidth.forTables(
        sfDir, Seq("documents"), cpus.toInt))
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
    val progressAcc = new ProgressAcc
    spark.streams.addListener(progressAcc)

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
    val dataParts = Using.resource(Files.list(dropDir)) { s =>
      s.iterator().asScala.toSeq
        .filter(_.toString.endsWith(".parquet")).sortBy(_.getFileName.toString)
    }
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
      val src = Using.resource(Files.list(one)) { s =>
        s.iterator().asScala.find(_.toString.endsWith(".parquet")).get
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
        maxStateRows: Long, maxStateBytes: Long, provider: String,
        horizonSecs: Long, heapAfterGc: Long,
        pairCount: Option[Long] = None, pairHash: Option[String] = None,
        violations: Option[Long] = None)

    def heapAfterGc(): Long = {
      System.gc(); Thread.sleep(300)
      Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory
    }

    /** idCol: the sink column carrying the document id, for the
      * flush-doc exclusion in rows_out. */
    def runOp(name: String, out: DataFrame, idCol: String = "doc_id",
        provider: String = "hdfs", horizonSecs: Long = 900): OpResult = {
      val providerClass =
        if (provider == "rocksdb") RocksProvider else HdfsProvider
      spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", providerClass)
      val sink = work.resolve(s"sink_$name").toString
      val ckpt = work.resolve(s"ckpt_$name").toString
      val t0 = System.nanoTime()
      val q = out.writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val acc = progressAcc.awaitTerminated(q.id)
      val rowsOut = spark.read.parquet(sink)
        .where(col(idCol) <= maxId).count()
      val r = OpResult(name, wall, acc.rowsIn, rowsOut, acc.rowsIn / wall,
        acc.batches, acc.maxStateRows, acc.maxStateBytes, provider,
        horizonSecs, heapAfterGc())
      println(f"[streambench] ${r.name}%-24s wall=${r.wallSec}%7.2fs " +
        f"in=${r.rowsIn}%9d out=${r.rowsOut}%9d rows/s=${r.rowsPerSec}%10.0f " +
        f"batches=${r.batches}%3d stateRows=${r.maxStateRows}%9d " +
        f"stateMB=${r.maxStateBytes / 1e6}%8.1f provider=$provider " +
        f"heapGB=${r.heapAfterGc / 1e9}%5.2f")
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

    // ---- lshdecomp mode: attribute the LSH stream's wall ------------
    // Five arms over the same coarse replay (2 files/trigger, 900 s
    // horizon): banding-only sinks isolate the map-side projection;
    // "full" arms run the IDENTICAL stateful tail over each banding.
    // state-op cost ≈ full_X − sink_X. r15 attributed the wall to
    // "state commit + object serde"; the composable-vs-fused sink pair
    // measures how much was actually the 8× interpreted-HOF banding.
    if (mode == "lshdecomp") {
      import graft.streaming.Streams
      val et = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout
      def pairStatsOf(sinkName: String): (Long, String) = {
        val r = spark.read.parquet(work.resolve(s"sink_$sinkName").toString)
          .where(col("docId") <= maxId && col("anchorId") <= maxId)
          .agg(count(lit(1)),
            sum(xxhash64(col("docId"), col("anchorId"), col("band"))
              .cast("decimal(38,0)")))
          .head
        (r.getLong(0),
          Option(r.getDecimal(1)).map(_.toBigInteger.toString).getOrElse("0"))
      }
      val arms = Seq(
        ("sink_composable", () => Streams.bandedDocsComposable(stream(2)), false),
        ("sink_fused", () => Streams.bandedDocs(stream(2)), false),
        ("sink_fused_repart",
          () => Streams.bandedDocs(stream(2).repartition(parts)), false),
        ("full_composable",
          () => Streams.nearDupCandidatesFromBanded(
            Streams.bandedDocsComposable(stream(2)), 900L, et).toDF(), true),
        ("full_fused",
          () => Streams.nearDupCandidatesFromBanded(
            Streams.bandedDocs(stream(2)), 900L, et).toDF(), true),
        ("full_fused_repart",
          () => Streams.nearDupCandidateStream(stream(2), horizonSecs = 900L,
            docParallelism = parts).toDF(), true))
      val rows = arms.map { case (name, mk, stateful) =>
        val r = runOp(name, mk(),
          idCol = if (stateful) "docId" else "doc_id", horizonSecs = 900L)
        if (stateful) {
          val (c, h) = pairStatsOf(name)
          r.copy(pairCount = Some(c), pairHash = Some(h))
        } else r
      }
      val json = {
        val ops = rows.map { r =>
          val extra = (r.pairCount, r.pairHash) match {
            case (Some(c), Some(h)) => s""", "pair_count": $c, "pair_hash": "$h""""
            case _ => ""
          }
          f""" "${r.name}": {"wall_sec": ${r.wallSec}%.2f, "rows_in": ${r.rowsIn}, "rows_out": ${r.rowsOut}, "batches": ${r.batches}, "max_state_rows": ${r.maxStateRows}$extra}"""
        }.mkString(",\n")
        s"""{"sf": "$sfDir", "n_docs": $nDocs, "n_files": $nFiles, "shuffle_partitions": $parts, "mode": "lshdecomp",
           | "protocol": "coarse AvailableNow replay (2 files/trigger), 900s horizon, hdfs provider; sink_* = banding projection straight to parquet (no state op), full_* = identical stateful tail over each banding; state-op cost = full_X - sink_X",
           |$ops
           |}""".stripMargin
      }
      println(json)
      outJson.foreach(p => Files.writeString(Paths.get(p), json))
      spark.stop()
      return
    }

    // ---- the probes ------------------------------------------------
    // maxFilesPerTrigger=2: data replays in nFiles/2 micro-batches and
    // the two flush files land in separate final batches, so the last
    // flush batch runs with the watermark already past every real doc.
    // Dedup: 15-min horizon over the 1-doc/s synthetic arrival ⇒ state
    // holds ~900 in-horizon digests per batch tail, NOT the corpus —
    // the bounded-state contract, observable in maxStateRows.
    val coreOps: Seq[OpResult] = if (liteLsh) Seq.empty else {
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
      Seq(dedup, lmJoin)
    }

    // ---- minhash-LSH candidate stream (r14 VERDICT #2/#3) ----------
    // The one streaming op whose state (band buckets within the
    // watermark horizon) is the genuine 100 TB risk. Three horizons:
    // state must track the HORIZON (900 s ≈ ≤900 arrivals × 4 bands ≈
    // 3.6 k buckets + batch lag, flat across sf), not the corpus; the
    // corpus-span horizon is the deliberate unbounded contrast AND the
    // configuration whose pair set is exactly batch-replayable.
    // docParallelism: a 2-file micro-batch is a 2-split scan, which
    // would serialize the banding projection on an idle 32-core box
    // (the r15 mis-attribution — see SCALE.md round-16 decomposition)
    def lshStream(horizonSecs: Long): DataFrame =
      graft.streaming.Streams.nearDupCandidateStream(
        stream(2), horizonSecs = horizonSecs, docParallelism = parts).toDF()
    // order-independent exactness reduction: count + sum of per-pair
    // xxhash64 in decimal(38,0) (a LongType sum could overflow — ANSI
    // mode would throw); flush-doc pairs excluded on either endpoint
    def pairStats(df: DataFrame): (Long, String) = {
      val r = df.where(col("docId") <= maxId && col("anchorId") <= maxId)
        .agg(count(lit(1)),
          sum(xxhash64(col("docId"), col("anchorId"), col("band"))
            .cast("decimal(38,0)")))
        .head
      (r.getLong(0),
        Option(r.getDecimal(1)).map(_.toBigInteger.toString).getOrElse("0"))
    }
    // batch replay on the SAME banded projection: anchor = first
    // arrival in (band, bucket) = min doc_id (ts is monotone in id)
    val banded = graft.streaming.Streams.bandedDocs(
      docs.withColumn("ts", timestamp_seconds(lit(epoch) + col("doc_id"))))
      .persist()
    val expectedFull = banded
      .groupBy("band", "bucket").agg(min("doc_id").as("anchorId"))
      .join(banded, Seq("band", "bucket"))
      .where(col("doc_id") =!= col("anchorId"))
      .select(col("doc_id").as("docId"), col("anchorId"), col("band"))
    val (expCount, expHash) = pairStats(expectedFull)
    // cohabitation validity for horizon runs (eviction re-anchors
    // buckets, so equality only holds at full horizon — but every
    // emitted pair must still share its band bucket): anti-join the
    // sink against the banded projection on both endpoints → 0 rows
    def cohabitationViolations(sinkName: String): Long = {
      val pairs = spark.read.parquet(work.resolve(s"sink_$sinkName").toString)
        .where(col("docId") <= maxId && col("anchorId") <= maxId)
      val b1 = banded.select(col("doc_id").as("docId"),
        col("band"), col("bucket"))
      val b2 = banded.select(col("doc_id").as("anchorId"),
        col("band"), col("bucket"))
      pairs.join(b1, Seq("docId", "band"))
        .join(b2, Seq("anchorId", "band", "bucket"), "left_anti")
        .count()
    }
    val corpusSpanSecs = maxId + 86400L * 3 // past every real + flush ts
    val lshH15 = {
      val r = runOp("lshCandidates_h15", lshStream(900), idCol = "docId",
        horizonSecs = 900)
      val (c, h) = pairStats(
        spark.read.parquet(work.resolve("sink_lshCandidates_h15").toString))
      r.copy(pairCount = Some(c), pairHash = Some(h),
        violations = Some(cohabitationViolations("lshCandidates_h15")))
    }
    val lshH60 = if (liteLsh) None else Some {
      val r = runOp("lshCandidates_h60", lshStream(3600), idCol = "docId",
        horizonSecs = 3600)
      val (c, h) = pairStats(
        spark.read.parquet(work.resolve("sink_lshCandidates_h60").toString))
      r.copy(pairCount = Some(c), pairHash = Some(h),
        violations = Some(cohabitationViolations("lshCandidates_h60")))
    }
    val lshFull = {
      val r = runOp("lshCandidates_full", lshStream(corpusSpanSecs),
        idCol = "docId", horizonSecs = corpusSpanSecs,
        provider = if (liteLsh) "rocksdb" else "hdfs")
      val (c, h) = pairStats(
        spark.read.parquet(work.resolve("sink_lshCandidates_full").toString))
      val exact = c == expCount && h == expHash
      println(s"[streambench] lsh full-horizon exactness vs batch replay: " +
        s"stream ($c, $h) vs batch ($expCount, $expHash) — " +
        (if (exact) "EXACT" else "MISMATCH"))
      r.copy(pairCount = Some(c), pairHash = Some(h),
        violations = Some(if (exact) 0L else -1L))
    }
    // RocksDB provider re-run of the h15 configuration: identical
    // deterministic replay ⇒ identical pair set required; state moves
    // out of executor heap (the 100 TB fix for horizon state that no
    // longer fits — r14 VERDICT #3)
    val lshRocks = {
      val r = runOp("lshCandidates_h15_rocksdb", lshStream(900),
        idCol = "docId", provider = "rocksdb", horizonSecs = 900)
      val (c, h) = pairStats(spark.read.parquet(
        work.resolve("sink_lshCandidates_h15_rocksdb").toString))
      val same = lshH15.pairCount.contains(c) && lshH15.pairHash.contains(h)
      println(s"[streambench] rocksdb vs hdfs pair set: " +
        (if (same) "IDENTICAL" else
          s"MISMATCH ($c,$h) vs (${lshH15.pairCount},${lshH15.pairHash})"))
      r.copy(pairCount = Some(c), pairHash = Some(h),
        violations = Some(if (same) 0L else -1L))
    }
    banded.unpersist()
    val results = coreOps ++ Seq(Some(lshH15), lshH60, Some(lshFull),
      Some(lshRocks)).flatten

    // lsh mode skips the dedup/LM batch anchors (their streaming arms
    // didn't run); -1 marks "not measured" in the artifact
    val batchDedup = if (liteLsh) -1.0 else timedBatch("llm_dedup_exact")
    val batchLm = if (liteLsh) -1.0 else timedBatch("llm_lm_score")
    val batchLsh = timedBatch("llm_minhash_lsh")

    val json = {
      val ops = results.map { r =>
        val extra = (r.pairCount, r.pairHash, r.violations) match {
          case (Some(c), Some(h), Some(v)) =>
            s""",\n   "pair_count": $c, "pair_hash": "$h", "violations": $v"""
          case _ => ""
        }
        f"""  "${r.name}": {"wall_sec": ${r.wallSec}%.2f, "rows_in": ${r.rowsIn},
           |   "rows_out": ${r.rowsOut}, "rows_per_sec": ${r.rowsPerSec}%.0f,
           |   "batches": ${r.batches}, "max_state_rows": ${r.maxStateRows},
           |   "max_state_bytes": ${r.maxStateBytes},
           |   "provider": "${r.provider}", "horizon_secs": ${r.horizonSecs},
           |   "heap_after_gc_bytes": ${r.heapAfterGc}$extra}""".stripMargin
      }.mkString(",\n")
      s"""{"sf": "$sfDir", "n_docs": $nDocs, "n_files": $nFiles, "shuffle_partitions": $parts, "mode": "$mode",
         | "protocol": "AvailableNow replay, maxFilesPerTrigger=2, ts=epoch+doc_id sec, 2 staggered flush docs drain append-mode state; progress via StreamingQueryListener (unbounded, r15); LSH pair sets reduced to count+xxhash64-sum, full-horizon set batch-replayed on the shared banded projection, h900 re-run under RocksDB must be identical; mode=lsh runs LSH arms only with the full-horizon arm under RocksDB and -1 marking unmeasured batch anchors",
         | "lsh_expected_full": {"pair_count": $expCount, "pair_hash": "$expHash"},
         | "batch_steady_sec": {"llm_dedup_exact": $batchDedup, "llm_lm_score": $batchLm, "llm_minhash_lsh": $batchLsh},
         |$ops
         |}""".stripMargin
    }
    println(json)
    outJson.foreach(p => Files.writeString(Paths.get(p), json))
    spark.stop()
  }
}
