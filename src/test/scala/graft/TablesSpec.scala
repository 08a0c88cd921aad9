package graft

/** The relation cache's advertised lifecycle: same DataFrame reference
  * until invalidate(), fresh relation afterwards (the documented recipe
  * for a rewritten data dir or a closing session). */
class TablesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("load caches per (session, dir, table) and invalidate() clears") {
    val a = Tables.nation(spark, dir)
    assert(Tables.nation(spark, dir) eq a, "second load must hit the cache")
    Tables.invalidate()
    assert(Tables.nation(spark, dir) ne a, "invalidate() must drop the entry")
  }

  test("invalidate(session) only clears that session's entries") {
    val a = Tables.nation(spark, dir)
    val other = spark.newSession()
    val b = Tables.nation(other, dir)
    Tables.invalidate(other)
    assert(Tables.nation(spark, dir) eq a, "other-session invalidate must not evict")
    assert(Tables.nation(other, dir) ne b)
  }

  // The driver has regenerated events.parquet with a different ts
  // encoding between rounds (nanos-as-long vs timestamp[us]); this
  // pins the loader's schema dispatch so the next drift is a red test,
  // not N silent plan-time failures downstream.
  test("events loader normalizes every ts encoding to a µs TIMESTAMP") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val base = java.nio.file.Files.createTempDirectory("tables-events").toString
    val micros = 1723500000123456L // 2024-08-12T22:40:00.123456Z
    def row(ts: Any) = Row(1L, ts, 7L, "click", 1.5, "{}")
    def schema(tsType: DataType) = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // nanos-as-long generation (legacy TIMESTAMP(NANOS) reads as int64)
    val nanosDir = s"$base/nanos"
    spark.createDataFrame(
      java.util.List.of(row(micros * 1000L)), schema(LongType))
      .write.parquet(s"$nanosDir/events.parquet")
    // native µs generations: TIMESTAMP and TIMESTAMP_NTZ
    val inst = java.time.Instant.ofEpochSecond(micros / 1000000L, (micros % 1000000L) * 1000L)
    val tzDir = s"$base/tz"
    spark.createDataFrame(
      java.util.List.of(row(java.sql.Timestamp.from(inst))), schema(TimestampType))
      .write.parquet(s"$tzDir/events.parquet")
    val ntzDir = s"$base/ntz"
    spark.createDataFrame(
      java.util.List.of(row(java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC))),
      schema(TimestampNTZType))
      .write.parquet(s"$ntzDir/events.parquet")
    for (d <- Seq(nanosDir, tzDir, ntzDir)) {
      val df = Tables.events(spark, d)
      assert(df.schema("ts").dataType == TimestampType, s"$d must load ts as TIMESTAMP")
      val got = df.select(unix_micros(col("ts"))).head.getLong(0)
      assert(got == micros, s"$d: expected $micros, got $got")
    }
  }

  // r9 ADVICE: the dispatch must FAIL LOUDLY on the encodings it does
  // not know, instead of casting whatever shows up (the silent-plausible
  // failure mode after the next testdata drift).
  test("events loader throws on unknown dtypes and out-of-range longs") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val base = java.nio.file.Files.createTempDirectory("tables-events-bad").toString
    def schema(tsType: DataType) = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType)))
    // a string-encoded ts generation must be rejected at load time
    val strDir = s"$base/str"
    spark.createDataFrame(
      java.util.List.of(Row(1L, "2024-08-12T22:40:00Z")), schema(StringType))
      .write.parquet(s"$strDir/events.parquet")
    val e = intercept[IllegalArgumentException] { Tables.events(spark, strDir) }
    assert(e.getMessage.contains("unexpected parquet dtype"), e.getMessage)
    // a micros-encoded int64 generation (values ~1e15, far below the
    // nanos epoch range) must raise at scan, not be divided into 1970
    val microsDir = s"$base/micros"
    spark.createDataFrame(
      java.util.List.of(Row(1L, 1723500000123456L)), schema(LongType))
      .write.parquet(s"$microsDir/events.parquet")
    val e2 = intercept[Exception] {
      Tables.events(spark, microsDir).select(col("ts")).collect()
    }
    assert(e2.getMessage.contains("nanos epoch range"), e2.getMessage)
  }

  // A NULL ts is valid data, not an encoding drift: it must load as a
  // null timestamp (and never reach the range guard, whose
  // raise_error(concat(..., NULL)) would throw a message-less error).
  test("events loader passes NULL int64 ts through as null timestamp") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val base = java.nio.file.Files.createTempDirectory("tables-events-null").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType)))
    spark.createDataFrame(
      java.util.List.of(Row(1L, null), Row(2L, 1723500000123456000L)), schema)
      .write.parquet(s"$base/events.parquet")
    val rows = Tables.events(spark, base)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(rows == Map(1L -> None, 2L -> Some(1723500000123456L)))
  }
}
