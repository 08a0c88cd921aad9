package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet test tables (TESTDATA.md).
  *
  * Reads are plain parquet scans so Catalyst can push filters and prune
  * columns into the scan (verified via `.explain`: `PushedFilters`,
  * `ReadSchema`).
  *
  * The resolved DataFrame (file listing + footer schema) is cached per
  * (session, dir, table): `spark.read.parquet` re-lists and re-reads
  * footers on every call, a driver-side fixed cost each of the 44 bench
  * queries paid separately. Reusing the RELATION does not pin any plan
  * shape — pruning/pushdown happen per query on top of it — and no row
  * data is cached.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Lifetime note: entries pin their SparkSession until invalidate() —
  // acceptable for the driver mains (one session per JVM) and the test
  // suite (one shared session); a long-lived multi-session service
  // should call invalidate(session) on session close. The cached file
  // listing also goes stale if the parquet dir is REWRITTEN in place —
  // call invalidate() after regenerating testdata.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, sfDir, name),
      spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Drop every cached relation (e.g. after regenerating a data dir). */
  def invalidate(): Unit = cache.clear()

  /** Drop one session's cached relations (call on session close). */
  def invalidate(session: SparkSession): Unit =
    cache.keys.foreach { k => if (k._1 == session) cache.remove(k) }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts has shipped in two encodings across testdata generations:
    * parquet TIMESTAMP(NANOS) (which Spark 4 only reads as raw longs via
    * the legacy conf) and plain timestamp[us] (read as TIMESTAMP_NTZ).
    * Dispatch on the loaded dtype so either generation yields a session-tz
    * TIMESTAMP column: LongType → floor-divide nanos to micros (matches
    * DuckDB's ns→s/date truncation); NTZ timestamp → cast (session tz is
    * UTC, so NTZ→TZ is value-identical). The dispatch is STRICT (r9
    * ADVICE): testdata has drifted once already, so an unrecognized
    * dtype throws at load and a LongType value outside the plausible
    * nanos epoch range (1990..2100) raises at scan time — a
    * micros-encoded int64 generation must fail loudly, not be silently
    * divided by 1000 into 1970. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // 1990-01-01 / 2100-01-01 as epoch nanos
        val loNanos = 631152000000000000L
        val hiNanos = 4102444800000000000L
        // NULL passes through as a null timestamp (a null row is valid
        // data, and raise_error(concat(..., NULL)) would otherwise
        // throw a message-less error); only NON-null out-of-range
        // values fail loudly.
        raw.withColumn("ts", timestamp_micros(
          when(col("ts").isNull, lit(null).cast(LongType))
            .when(col("ts").between(loNanos, hiNanos), expr("ts div 1000"))
            .otherwise(expr(
              "raise_error(concat('events.ts: int64 value ', ts, " +
                "' is outside the plausible nanos epoch range — " +
                "re-check the testdata encoding'))").cast(LongType))))
      case TimestampType => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"events.ts: unexpected parquet dtype ${other.catalogString} — " +
          "known generations are TIMESTAMP(NANOS) (read as long) and " +
          "timestamp[us]; add an explicit dispatch branch for the new " +
          "encoding rather than guessing")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
