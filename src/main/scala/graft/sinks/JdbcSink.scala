package graft.sinks

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
      loadParallelism: Int = 8)

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
    * here is creation, never an in-place mutation of published data. */
  def writeTable(df: DataFrame, target: JdbcTarget, table: String): Unit =
    df.coalesce(target.loadParallelism)
      .write.mode(SaveMode.Overwrite)
      .jdbc(target.url, table, props(target))

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
