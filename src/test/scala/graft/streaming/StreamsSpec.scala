package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkSpec {

  test("feed-drop stream drains snapshots with Trigger.AvailableNow") {
    val drop = Files.createTempDirectory("drop")
    val out = Files.createTempDirectory("drained")
    val ckpt = Files.createTempDirectory("ckpt")
    Files.writeString(drop.resolve("stops-1.txt"),
      "stop_id,stop_name,stop_lat,stop_lon,location_type,parent_station\n" +
        "s1,A,52.5,13.4,0,\ns2,B,52.6,13.5,0,\n")
    Streams.drainDropToParquet(spark, drop.toString, "stops",
      out.resolve("stops").toString, ckpt.toString)
    assert(spark.read.parquet(out.resolve("stops").toString).count() == 2)
    // a second snapshot landing later is picked up by the next drain
    Files.writeString(drop.resolve("stops-2.txt"),
      "stop_id,stop_name,stop_lat,stop_lon,location_type,parent_station\n" +
        "s3,C,52.7,13.6,0,\n")
    Streams.drainDropToParquet(spark, drop.toString, "stops",
      out.resolve("stops").toString, ckpt.toString)
    assert(spark.read.parquet(out.resolve("stops").toString).count() == 3)
  }

  test("watermarked windowed aggregation over an event stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = Streams.eventCountsByWindow(events, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData((t("2024-01-01 10:05:00"), "click", 1.0),
        (t("2024-01-01 10:45:00"), "click", 2.0),
        (t("2024-01-01 11:05:00"), "view", 3.0))
      q.processAllAvailable()
      // advance the watermark far enough to close the 10:00 window
      mem.addData((t("2024-01-01 14:00:00"), "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select(date_format(col("window_start"), "HH:mm").as("w"),
          col("event_type"), col("n_events"), col("value_sum"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(rows.contains(("10:00", "click", 2L, 3.0)))
      assert(rows.contains(("11:00", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("streaming exact dedup keeps first doc per digest within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = Streams.dedupDocStream(docs, "1 hour")
      .writeStream.format("memory").queryName("dedup_docs")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      // same text twice within the horizon → second dropped; distinct
      // text passes
      mem.addData((t("2024-01-01 10:00:00"), 1L, "the quick brown fox"),
        (t("2024-01-01 10:10:00"), 2L, "the quick brown fox"),
        (t("2024-01-01 10:20:00"), 3L, "an entirely different doc"))
      q.processAllAvailable()
      val ids = spark.table("dedup_docs").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L), s"got $ids")
      // after the watermark evicts the digest, the same text is admitted
      // again (state is horizon-bounded, not corpus-bounded)
      mem.addData((t("2024-01-01 14:00:00"), 4L, "advance watermark"))
      q.processAllAvailable()
      mem.addData((t("2024-01-01 14:10:00"), 5L, "the quick brown fox"))
      q.processAllAvailable()
      val ids2 = spark.table("dedup_docs").select("doc_id").as[Long].collect().toSet
      assert(ids2.contains(5L), s"re-admitted doc missing: $ids2")
    } finally q.stop()
  }

  test("streaming minhash-LSH near-dup candidates pair docs against bucket anchors") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    // NoTimeout for determinism (same pattern as sessionize); production
    // uses EventTimeTimeout so bucket anchors evict after the horizon
    val q = Streams.nearDupCandidateStream(docs,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("neardup_cands")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      val a = "the quick brown fox jumps over the lazy dog again and again"
      val b = "an entirely different document about spark streaming state"
      mem.addData((t("2024-01-01 10:00:00"), 1L, a))
      q.processAllAvailable()
      // identical text => identical shingle set => ALL bands collide
      // with doc 1's buckets; unrelated text collides with none
      mem.addData((t("2024-01-01 10:10:00"), 2L, a),
        (t("2024-01-01 10:20:00"), 3L, b))
      q.processAllAvailable()
      val pairs = spark.table("neardup_cands")
        .select("docId", "anchorId").as[(Long, Long)].collect().toSet
      assert(pairs == Set((2L, 1L)), s"got $pairs")
      // candidates stream is append-only pairs: the anchor itself and
      // the unrelated doc emit nothing
      val nBandHits = spark.table("neardup_cands").count()
      assert(nBandHits == 4, s"identical docs collide in all 4 bands: $nBandHits")
    } finally q.stop()
  }

  test("sessionize: gap-based session windows via flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Event]
    // NoTimeout → sessions close only in-batch: deterministic, and the
    // engine does not spin empty timeout batches under processAllAvailable
    val q = Streams.sessionize(mem.toDS(), gapSecs = 600,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      def ev(u: Long, s: String) = Streams.Event(u, java.sql.Timestamp.valueOf(s), "e")
      // user 1: two bursts separated by > gap → first session closes in-batch
      mem.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:05:00"),
        ev(1, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[Streams.Session].collect()
      assert(sessions.exists(s => s.userId == 1 && s.nEvents == 2 && s.durationSecs == 300),
        s"expected closed first session, got ${sessions.toSeq}")
    } finally q.stop()
  }
}
