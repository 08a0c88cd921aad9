package graft.sinks

import java.sql.{Connection, DriverManager}
import java.util.Properties
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types._
import scala.util.Using

/** K1: bulk load into a fresh relational database over JDBC — the
  * Spark-native `gtfs-to-sql | … | psql` stage
  * (/root/reference/import.sh:124-132, SURVEY.md §2.2 K1).
  *
  * The reference's `zstd | sponge | zstd -d` barrier fully materializes
  * the SQL stream before psql begins, keeping the DB transaction window
  * short. The analog here: entities are already materialized (parquet
  * staging in the import dir) before `loadFeed` opens any JDBC
  * connection, so load time is pure insert throughput.
  *
  * Scale notes: `df.write.jdbc` runs one connection per partition with
  * `batchsize` batched inserts — at cluster scale, repartition to the
  * DB's ingest parallelism (not the shuffle width) before loading; a
  * PostgreSQL target would use `COPY` via a foreachPartition CopyManager
  * for another ~5×, which slots behind this same interface. */
object JdbcSink {

  final case class JdbcTarget(url: String, user: String = "", password: String = "",
      driver: Option[String] = None, batchSize: Int = 10000,
      loadParallelism: Int = 8,
      // K1 COPY fast path: Some(provider) forces the COPY protocol with
      // that provider (tests inject a fake); None auto-enables the
      // reflective PG provider for jdbc:postgresql URLs and keeps the
      // batched-INSERT path for everything else (Derby fallback).
      copyProvider: Option[CopyProvider] = None) {
    def effectiveCopyProvider: Option[CopyProvider] =
      copyProvider.orElse(
        if (url.startsWith("jdbc:postgresql:")) Some(PgCopyProvider) else None)
  }

  /** One open `COPY … FROM STDIN` channel on a connection. */
  trait CopyStream {
    def write(bytes: Array[Byte], off: Int, len: Int): Unit
    /** Finish the COPY; returns rows written. */
    def end(): Long
  }

  /** Factory for COPY channels. Serializable: instances are captured by
    * the foreachPartition closure and shipped to executors. */
  trait CopyProvider extends Serializable {
    def open(conn: Connection, copySql: String): CopyStream
  }

  /** The real PostgreSQL COPY provider, bound via reflection so the
    * library compiles and tests without a PG driver on the classpath
    * (this container has none); at runtime any org.postgresql driver
    * ≥9.x provides these classes. Equivalent to
    * `conn.unwrap(PGConnection).getCopyAPI.copyIn(sql)`. */
  object PgCopyProvider extends CopyProvider {
    def open(conn: Connection, copySql: String): CopyStream = {
      val pgConnCls = Class.forName("org.postgresql.PGConnection")
      val pg = conn.unwrap(pgConnCls.asInstanceOf[Class[AnyRef]])
      val cm = pgConnCls.getMethod("getCopyAPI").invoke(pg)
      val copyIn = cm.getClass.getMethod("copyIn", classOf[String])
        .invoke(cm, copySql)
      val copyInCls = Class.forName("org.postgresql.copy.CopyIn")
      val writeM = copyInCls.getMethod("writeToCopy",
        classOf[Array[Byte]], classOf[Int], classOf[Int])
      val endM = copyInCls.getMethod("endCopy")
      new CopyStream {
        def write(bytes: Array[Byte], off: Int, len: Int): Unit =
          writeM.invoke(copyIn, bytes, Int.box(off), Int.box(len))
        def end(): Long = endM.invoke(copyIn).asInstanceOf[Long]
      }
    }
  }

  private def props(t: JdbcTarget): Properties = {
    val p = new Properties()
    if (t.user.nonEmpty) p.setProperty("user", t.user)
    if (t.password.nonEmpty) p.setProperty("password", t.password)
    t.driver.foreach(p.setProperty("driver", _))
    p.setProperty("batchsize", t.batchSize.toString)
    p
  }

  /** Write one entity DataFrame to `<schema>.<table>` (schema optional),
    * overwriting — each import targets a FRESH database, so overwrite
    * here is creation, never an in-place mutation of published data.
    * PostgreSQL targets take the COPY fast path automatically; other
    * engines use Spark's batched-INSERT JDBC writer. */
  def writeTable(df: DataFrame, target: JdbcTarget, table: String): Unit =
    target.effectiveCopyProvider match {
      case Some(p) => writeTableCopy(df, target, table, p)
      case None =>
        df.coalesce(target.loadParallelism)
          .write.mode(SaveMode.Overwrite)
          .jdbc(target.url, table, props(target))
    }

  /** K1 COPY fast path: `COPY <staging> FROM STDIN WITH (FORMAT csv)`
    * per partition — the protocol the reference's `gtfs-to-sql | psql`
    * pipe rides on (/root/reference/import.sh:124-132); ~5× over
    * batched INSERT at real-PG scale because rows stream through one
    * protocol message instead of one prepared-statement execution per
    * batch.
    *
    * Exactly-once under task retries AND speculative twins: each
    * partition COPYs into its OWN staging table inside one transaction
    * that first takes an EXCLUSIVE table lock and deletes any earlier
    * attempt's rows — concurrent attempts serialize on the lock and
    * the last committer wins whole, so re-execution can never duplicate
    * (a direct COPY into the target had no cleanup between attempts).
    * The driver then moves all stagings into the target in ONE
    * transaction — the Spark analog of the reference's
    * `zstd | sponge | psql` barrier (import.sh:124-132): fully
    * materialize, then one atomic publish. */
  def writeTableCopy(df: DataFrame, target: JdbcTarget, table: String,
      provider: CopyProvider): Unit = {
    // the table name is used VERBATIM (unquoted), matching Spark's own
    // JDBC writer and readTable — quoting would create case-sensitive
    // identifiers an unquoted read can't resolve on case-folding engines
    val colDefs = df.schema.fields
      .map(f => s""""${f.name}" ${sqlType(f.dataType)}""").mkString(", ")
    val cols = df.schema.fieldNames.map(n => s""""$n"""").mkString(", ")
    def dropIfPresent(tbl: String): Unit =
      try executeDdl(target, s"DROP TABLE $tbl")
      catch { case _: java.sql.SQLException => () } // usually absent
    dropIfPresent(table)
    executeDdl(target, s"CREATE TABLE $table ($colDefs)")
    val stagings = (0 until target.loadParallelism).map(i => s"${table}__cp$i")
    stagings.foreach { s => dropIfPresent(s); executeDdl(target, s"CREATE TABLE $s ($colDefs)") }
    val t = target // capture the case class, not the method owner
    df.coalesce(target.loadParallelism).foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        Using.resource(connect(t)) { conn =>
          copyPartition(conn, s"${table}__cp$pid", cols, provider, rows)
        }
      }
    }
    // consolidate: one transaction, so the target flips from empty to
    // complete atomically; stagings dropped only after the commit.
    // connect(), not an inline getConnection: the helper also loads
    // target.driver, which an inline call silently depended on earlier
    // executeDdl invocations having done in this JVM
    Using.resource(connect(target)) { c =>
      c.setAutoCommit(false)
      stagings.foreach { s =>
        Using.resource(c.createStatement())(
          _.execute(s"INSERT INTO $table ($cols) SELECT $cols FROM $s"))
      }
      c.commit()
      c.setAutoCommit(true)
      stagings.foreach { s =>
        Using.resource(c.createStatement())(_.execute(s"DROP TABLE $s"))
      }
    }
  }

  /** One partition attempt's staging write: LOCK (serializes
    * speculative twins), DELETE (clears a previously COMMITTED
    * attempt), COPY, COMMIT — all one transaction, so any interleaving
    * of attempts leaves exactly one attempt's rows. Package-visible so
    * the spec can replay a retry directly. */
  private[sinks] def copyPartition(conn: Connection, staging: String,
      cols: String, provider: CopyProvider, rows: Iterator[Row]): Unit = {
    val copySql = s"COPY $staging ($cols) FROM STDIN WITH (FORMAT csv)"
    conn.setAutoCommit(false)
    // LOCK TABLE ... IN EXCLUSIVE MODE is shared PG/Derby syntax
    Using.resource(conn.createStatement()) { st =>
      st.execute(s"LOCK TABLE $staging IN EXCLUSIVE MODE")
      st.execute(s"DELETE FROM $staging")
    }
    val cs = provider.open(conn, copySql)
    val sb = new StringBuilder(1 << 16)
    rows.foreach { row =>
      encodeCsvRow(row, sb)
      if (sb.length >= (1 << 16)) flushCsv(cs, sb)
    }
    flushCsv(cs, sb)
    cs.end()
    conn.commit()
    conn.setAutoCommit(true)
  }

  private def flushCsv(cs: CopyStream, sb: StringBuilder): Unit =
    if (sb.nonEmpty) {
      val bytes = sb.toString.getBytes("UTF-8")
      cs.write(bytes, 0, bytes.length)
      sb.clear()
    }

  /** COPY CSV conventions: unquoted empty = NULL; strings always quoted
    * (so the empty string stays distinct from NULL) with `""` escapes;
    * embedded newlines/CRs stay raw inside the quotes (PG COPY CSV does
    * not normalize them); everything else in its JDBC toString form.
    * Package-visible for the round-trip property spec. */
  private[sinks] def encodeCsvRow(row: Row, sb: StringBuilder): Unit = {
    var i = 0
    while (i < row.length) {
      if (i > 0) sb.append(',')
      if (!row.isNullAt(i)) row.get(i) match {
        case s: String =>
          sb.append('"')
          var j = 0
          while (j < s.length) {
            val c = s.charAt(j)
            if (c == '"') sb.append("\"\"") else sb.append(c)
            j += 1
          }
          sb.append('"')
        case other => sb.append(other.toString)
      }
      i += 1
    }
    sb.append('\n')
  }

  /** Engine-portable DDL types for the COPY staging table (PG accepts
    * all of these; Derby lacks TEXT, hence VARCHAR). */
  private def sqlType(dt: DataType): String = dt match {
    case StringType => "VARCHAR(10000)"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case DoubleType => "DOUBLE PRECISION"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case ShortType | ByteType => "SMALLINT"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"no COPY DDL mapping for $other — load this entity via the INSERT path")
  }

  private def connect(t: JdbcTarget): Connection = {
    t.driver.foreach(Class.forName)
    if (t.user.nonEmpty) DriverManager.getConnection(t.url, t.user, t.password)
    else DriverManager.getConnection(t.url)
  }

  /** Load a whole feed (entity → DataFrame) into the target DB. */
  def loadFeed(feed: Map[String, DataFrame], target: JdbcTarget): Unit =
    feed.foreach { case (entity, df) => writeTable(df, target, entity) }

  /** Load a feed into one schema per import — the reference's
    * per-import PostgreSQL *database* (import.js:246-247) mapped onto a
    * per-import *schema* of a long-lived target DB (L5 --schema,
    * import.sh:128). The schema is created explicitly first: PostgreSQL
    * does NOT create schemas implicitly on table creation (only Derby
    * does, which is why the Derby-only test didn't catch it); an
    * already-existing schema is tolerated so a retried import can
    * proceed. */
  def loadFeedIntoSchema(feed: Map[String, DataFrame], target: JdbcTarget,
      schema: String): Unit = {
    try executeDdl(target, s"""CREATE SCHEMA "$schema"""")
    catch {
      // tolerate ONLY "schema exists" (retried import): PG 42P06,
      // Derby X0Y68; anything else (permissions, connectivity) must
      // surface here, not as a misleading downstream table error
      case e: java.sql.SQLException
        if e.getSQLState == "42P06" || e.getSQLState == "X0Y68" => ()
    }
    feed.foreach { case (entity, df) =>
      writeTable(df, target, s"$schema.$entity")
    }
  }

  /** T4 retention for the JDBC side: drop every table in the import's
    * schema (discovered via JDBC metadata — engine-portable), then the
    * schema itself. Tolerates a schema that never existed. The schema
    * name is ESCAPED before use as a getTables pattern — '_' is a
    * single-char wildcard in JDBC metadata patterns, and import schema
    * names (gtfs_<ts>_<digest>) contain two of them; unescaped, the
    * pattern could enumerate (and then DROP) tables of an unrelated
    * schema differing only at a '_' position. DROP SCHEMA is attempted
    * even when no tables were found, so an import that died between
    * schema creation and first table load is still reaped. */
  def dropSchema(target: JdbcTarget, schema: String): Unit = {
    val conn =
      if (target.user.nonEmpty)
        DriverManager.getConnection(target.url, target.user, target.password)
      else DriverManager.getConnection(target.url)
    Using.resource(conn) { c =>
      val md = c.getMetaData
      val esc = md.getSearchStringEscape
      def pattern(s: String) =
        s.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
      // unquoted identifiers are case-folded per engine (Derby: upper)
      val candidates = Seq(schema, schema.toUpperCase(java.util.Locale.ROOT),
        schema.toLowerCase(java.util.Locale.ROOT)).distinct
      candidates.foreach { sc =>
        // belt and braces: the escaped pattern narrows the scan, and the
        // exact TABLE_SCHEM filter guarantees no wildcard leakage even
        // on drivers that ignore escapes in metadata patterns (Derby
        // does) — without it, '_' positions in the name could match and
        // DROP another schema's tables
        val tables = Using.resource(
          md.getTables(null, pattern(sc), "%", Array("TABLE"))) { rs =>
          Iterator.continually(rs).takeWhile(_.next())
            .map(r => (r.getString("TABLE_SCHEM"), r.getString("TABLE_NAME")))
            .filter(_._1 == sc).map(_._2).toList
        }
        tables.foreach { t =>
          Using.resource(c.createStatement())(_.execute(s"""DROP TABLE "$sc"."$t""""))
        }
        try Using.resource(c.createStatement())(
          _.execute(s"""DROP SCHEMA "$sc" RESTRICT"""))
        catch { case _: java.sql.SQLException => () } // absent, or PG non-table members
      }
    }
  }

  def readTable(spark: SparkSession, target: JdbcTarget, table: String): DataFrame =
    spark.read.jdbc(target.url, table, props(target))

  /** K5 DDL on a separate connection (CREATE/DROP DATABASE cannot run
    * inside the bookkeeping transaction — /root/reference/import.js:115-118).
    * For embedded engines (Derby) "database" creation is connection-url
    * driven; for PostgreSQL this executes CREATE/DROP DATABASE. */
  def executeDdl(url: String, sql: String): Unit =
    Using.resource(DriverManager.getConnection(url)) { conn =>
      Using.resource(conn.createStatement())(_.execute(sql))
    }

  /** DDL on the target's credentials (CREATE SCHEMA etc.). */
  def executeDdl(target: JdbcTarget, sql: String): Unit = {
    val conn =
      if (target.user.nonEmpty)
        DriverManager.getConnection(target.url, target.user, target.password)
      else DriverManager.getConnection(target.url)
    Using.resource(conn) { c =>
      Using.resource(c.createStatement())(_.execute(sql))
    }
  }
}
