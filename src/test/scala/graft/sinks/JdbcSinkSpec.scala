package graft.sinks

import graft.SparkSpec
import JdbcSink.JdbcTarget

/** A stand-in CopyManager: accepts the streamed COPY CSV bytes and
  * applies them to the table with plain JDBC INSERTs on the same
  * connection — so the spec exercises every real piece of the fast path
  * (DDL from the DataFrame schema, per-partition connections, CSV
  * encoding, COPY command text) without a PostgreSQL server. An object
  * so executor threads (same JVM in local mode) share the instance. */
object FakeCopy extends JdbcSink.CopyProvider {
  val seenSql = new java.util.concurrent.atomic.AtomicReference[String]("")

  /** COPY CSV field decode: unquoted empty → NULL (None); quoted fields
    * unescape `""`; bare fields taken verbatim. */
  def parseCsvLine(line: String): Seq[Option[String]] = {
    val out = Vector.newBuilder[Option[String]]
    var i = 0
    val n = line.length
    while (i <= n) {
      if (i < n && line.charAt(i) == '"') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done) {
          if (line.charAt(i) == '"') {
            if (i + 1 < n && line.charAt(i + 1) == '"') { sb.append('"'); i += 2 }
            else { i += 1; done = true }
          } else { sb.append(line.charAt(i)); i += 1 }
        }
        out += Some(sb.toString)
        i += 1 // skip the comma (or step past end)
      } else {
        val end = line.indexOf(',', i)
        val stop = if (end < 0) n else end
        out += (if (stop == i) None else Some(line.substring(i, stop)))
        i = stop + 1
      }
    }
    out.result()
  }

  def open(conn: java.sql.Connection, copySql: String): JdbcSink.CopyStream = {
    seenSql.set(copySql)
    val table = copySql.stripPrefix("COPY ").takeWhile(_ != ' ')
    val baos = new java.io.ByteArrayOutputStream()
    new JdbcSink.CopyStream {
      def write(bytes: Array[Byte], off: Int, len: Int): Unit =
        baos.write(bytes, off, len)
      def end(): Long = {
        val lines = new String(baos.toByteArray, "UTF-8")
          .split("\n").filter(_.nonEmpty)
        val meta = scala.util.Using.resource(conn.createStatement()) { st =>
          val rs = st.executeQuery(s"SELECT * FROM $table WHERE 1=0")
          val md = rs.getMetaData
          (1 to md.getColumnCount).map(md.getColumnType)
        }
        val ph = meta.indices.map(_ => "?").mkString(", ")
        scala.util.Using.resource(
          conn.prepareStatement(s"INSERT INTO $table VALUES ($ph)")) { ps =>
          lines.foreach { l =>
            parseCsvLine(l).zipWithIndex.foreach { case (v, ix) =>
              import java.sql.Types._
              (v, meta(ix)) match {
                case (None, ty) => ps.setNull(ix + 1, ty)
                case (Some(s), INTEGER | SMALLINT) => ps.setInt(ix + 1, s.toInt)
                case (Some(s), BIGINT) => ps.setLong(ix + 1, s.toLong)
                case (Some(s), DOUBLE | FLOAT | REAL) => ps.setDouble(ix + 1, s.toDouble)
                case (Some(s), _) => ps.setString(ix + 1, s)
              }
            }
            ps.executeUpdate()
          }
        }
        lines.length.toLong
      }
    }
  }
}

/** K1 bulk load exercised end-to-end against embedded Derby (the JDBC
  * engine shipped with Spark) — write a feed entity, read it back. */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val target = JdbcTarget(url, loadParallelism = 2)

  test("writeTable + readTable round-trip (fresh-db overwrite semantics)") {
    val stops = Seq(("s1", "A", 52.5, 13.4), ("s2", "B", 52.6, 13.5))
      .toDF("stop_id", "stop_name", "stop_lat", "stop_lon")
    JdbcSink.writeTable(stops, target, "stops")
    val back = JdbcSink.readTable(spark, target, "stops")
    assert(back.count() == 2)
    assert(back.select("stop_id").as[String].collect().toSet == Set("s1", "s2"))
    // overwrite = fresh creation (per-import DB), not append
    JdbcSink.writeTable(stops.limit(1), target, "stops")
    assert(JdbcSink.readTable(spark, target, "stops").count() == 1)
  }

  test("loadFeed writes every entity") {
    val feed = Map(
      "routes" -> Seq(("r1", 1)).toDF("route_id", "route_type"),
      "trips" -> Seq(("t1", "r1"), ("t2", "r1")).toDF("trip_id", "route_id"))
    JdbcSink.loadFeed(feed, target)
    assert(JdbcSink.readTable(spark, target, "routes").count() == 1)
    assert(JdbcSink.readTable(spark, target, "trips").count() == 2)
  }

  test("K5 DDL runs on a separate connection") {
    JdbcSink.executeDdl(url, "CREATE TABLE bookkeeping(db_name VARCHAR(64))")
    JdbcSink.executeDdl(url, "DROP TABLE bookkeeping")
  }

  test("dropSchema does not wildcard-match other schemas through '_'") {
    // '_' is a single-char wildcard in JDBC metadata patterns; the
    // victim schema name differs from the import schema only at the
    // '_' positions, so an unescaped pattern would enumerate (and drop)
    // its tables — the data-loss case the escape exists for
    val imp = Seq(("x", 1)).toDF("a", "b")
    JdbcSink.loadFeedIntoSchema(Map("t" -> imp), target, "gtfs_1_ab")
    JdbcSink.loadFeedIntoSchema(Map("t" -> imp), target, "gtfsX1Xab")
    JdbcSink.dropSchema(target, "gtfs_1_ab")
    // the look-alike schema survives with its table intact
    assert(JdbcSink.readTable(spark, target, "gtfsX1Xab.t").count() == 1)
    // the dropped schema's table is gone
    intercept[Exception] {
      JdbcSink.readTable(spark, target, "gtfs_1_ab.t").count()
    }
  }

  test("K1 COPY fast path: partitions stream CSV through the provider into the table") {
    import FakeCopy.parseCsvLine
    // quote-escaping, NULL vs empty string, numerics — the encodings
    // that differ between COPY CSV and naive join-on-comma
    val docs = Seq(
      ("d1", Some("he said \"hi\", twice"), 5, 1.5),
      ("d2", None, 7, 2.5),
      ("d3", Some(""), 9, 3.5))
      .toDF("id", "body", "n", "score")
    val t = target.copy(copyProvider = Some(FakeCopy))
    JdbcSink.writeTable(docs, t, "copydocs")
    val back = JdbcSink.readTable(spark, target, "copydocs")
    assert(back.count() == 3)
    assert(back.where($"body".isNull).select("id").as[String].collect().toSet == Set("d2"),
      "unquoted empty field decodes as NULL")
    assert(back.where($"body" === "").select("id").as[String].collect().toSet == Set("d3"),
      "quoted empty field stays an empty string, distinct from NULL")
    assert(back.where($"id" === "d1").select("body").as[String].head() ==
      "he said \"hi\", twice", "doubled-quote escapes round-trip")
    assert(back.where($"id" === "d1").select("score").as[Double].head() == 1.5)
    // overwrite = fresh creation, same as the INSERT path
    JdbcSink.writeTable(docs.limit(1), t, "copydocs")
    assert(JdbcSink.readTable(spark, target, "copydocs").count() == 1)
    // the provider saw a well-formed COPY command (into the partition's
    // staging table — the exactly-once barrier, consolidated afterwards)
    assert(FakeCopy.seenSql.get().startsWith("COPY copydocs__cp"),
      FakeCopy.seenSql.get())
    assert(FakeCopy.seenSql.get().contains("(\"id\", \"body\""),
      FakeCopy.seenSql.get())
    // no staging tables survive a successful load
    intercept[Exception] {
      JdbcSink.readTable(spark, target, "copydocs__cp0").count()
    }
    // sanity on the parser itself
    assert(parseCsvLine("a,\"b\"\"c\",,\"\"") ==
      Seq(Some("a"), Some("b\"c"), None, Some("")))
  }

  test("non-PG URLs keep the batched-INSERT fallback (no provider invoked)") {
    FakeCopy.seenSql.set("")
    val df = Seq(("x", 1)).toDF("a", "b")
    JdbcSink.writeTable(df, target, "fallback_t") // Derby target, no provider
    assert(JdbcSink.readTable(spark, target, "fallback_t").count() == 1)
    assert(FakeCopy.seenSql.get().isEmpty)
    assert(target.effectiveCopyProvider.isEmpty, "Derby URL must not auto-enable COPY")
    assert(JdbcTarget("jdbc:postgresql://h/db").effectiveCopyProvider
      .contains(JdbcSink.PgCopyProvider), "PG URL auto-enables the COPY path")
  }

  test("copyPartition is idempotent: a retried attempt leaves one copy") {
    import org.apache.spark.sql.Row
    JdbcSink.executeDdl(url, "CREATE TABLE retry_stg(a VARCHAR(64), b INTEGER)")
    val rows = Seq(Row("x", Int.box(1)), Row("y", Int.box(2)))
    def attempt(): Unit =
      scala.util.Using.resource(java.sql.DriverManager.getConnection(url)) { c =>
        JdbcSink.copyPartition(c, "retry_stg", "\"a\", \"b\"", FakeCopy,
          rows.iterator)
      }
    attempt() // first attempt commits
    attempt() // task retry / speculative twin re-runs the SAME partition
    val back = JdbcSink.readTable(spark, target, "retry_stg")
    assert(back.count() == 2, "LOCK+DELETE+COPY leaves exactly one attempt's rows")
    JdbcSink.executeDdl(url, "DROP TABLE retry_stg")
  }

  test("encodeCsvRow round-trips arbitrary strings through a real CSV parser") {
    // COPY correctness is byte-level: quotes, commas, embedded
    // newlines/CRs, unicode (incl. non-BMP), empty-vs-NULL must all
    // survive encode -> parse by PG COPY CSV rules. The parser is
    // univocity (the one Spark's own CSV source uses), configured to PG
    // semantics: quote '"', escape '""', unquoted empty = NULL, NO line
    // normalization inside quotes.
    import com.univocity.parsers.csv.{CsvParser, CsvParserSettings}
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(7)
    def randChar(): Char = rnd.nextInt(6) match {
      case 0 => '"'
      case 1 => ','
      case 2 => '\n'
      case 3 => '\r'
      case 4 => (32 + rnd.nextInt(95)).toChar
      case _ => (0xa1 + rnd.nextInt(0x2000)).toChar
    }
    def randCell(): Option[String] =
      if (rnd.nextInt(5) == 0) None
      else Some((0 until rnd.nextInt(12)).map(_ => randChar()).mkString +
        (if (rnd.nextInt(4) == 0) "🙂" else "")) // non-BMP smiley
    (1 to 20).foreach { round =>
      val rows = (1 to 30).map(_ => (0 until 4).map(_ => randCell()))
      val sb = new StringBuilder
      rows.foreach { r =>
        JdbcSink.encodeCsvRow(
          org.apache.spark.sql.Row(r.map(_.orNull): _*), sb)
      }
      val settings = new CsvParserSettings
      settings.getFormat.setLineSeparator("\n")
      settings.getFormat.setDelimiter(',')
      settings.getFormat.setQuote('"')
      settings.getFormat.setQuoteEscape('"')
      settings.setNullValue(null)
      settings.setEmptyValue("")
      settings.setIgnoreLeadingWhitespaces(false)
      settings.setIgnoreTrailingWhitespaces(false)
      settings.setNormalizeLineEndingsWithinQuotes(false) // PG keeps \r\n raw
      settings.setMaxCharsPerColumn(1 << 16)
      val parsed = new CsvParser(settings)
        .parseAll(new java.io.StringReader(sb.toString)).asScala
        .map(_.toSeq.map(Option(_)))
      assert(parsed.size == rows.size, s"row count (round $round)")
      parsed.zip(rows).zipWithIndex.foreach { case ((got, want), i) =>
        assert(got == want, s"row $i (round $round)")
      }
    }
  }

  test("dropSchema reaps a schema that never received tables") {
    JdbcSink.executeDdl(target, """CREATE SCHEMA "empty_import"""")
    JdbcSink.dropSchema(target, "empty_import")
    // re-creating proves the DROP happened (Derby errors on duplicates)
    JdbcSink.executeDdl(target, """CREATE SCHEMA "empty_import"""")
    JdbcSink.dropSchema(target, "empty_import")
  }
}
