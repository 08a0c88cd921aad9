package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._
import scala.util.Using
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gtfs.{Clean, Schemas, Views}
import graft.meta.{MetaStore, SuccessfulImport}

/** The atomic import pipeline — the Spark-native
  * `importGtfsAtomically` (/root/reference/import.js:38-324; lifecycle
  * walked in SURVEY.md §3.1). Each import lands in a FRESH per-import
  * database directory and is published by a single atomic meta-table
  * rename — readers never see partial state (T5); aborted imports leave
  * orphan dirs that the next run's retention pass reaps (T3/T6).
  */
object Import {

  /** Config mirror of import.js:57-77 (cfg > env > default merge is the
    * caller's concern; this is the merged result). */
  final case class Config(
      feedSource: Path,                       // zip file or extracted dir (S1 output)
      storeRoot: Path,                        // MetaStore root
      dbPrefix: String,                       // GTFS_IMPORTER_DB_PREFIX + "_"
      tmpDir: Path,
      feedUrl: Option[String] = None,         // S1: mirror-download first if set
      userAgent: String = "",                 // mandatory when feedUrl is set
      postprocessingDir: Option[Path] = None, // hashed into the digest (H3)
      preprocess: Option[Clean.Feed => Clean.Feed] = None, // C19 hook
      postprocessSql: Seq[String] = Seq.empty, // run via spark.sql on entity views
      cleanConfig: Clean.Config = Clean.Config(),
      determineDbsToRetain: Retention.Policy = Retention.newestTwo,
      continueOnDeleteFailure: Boolean = false, // GTFS_IMPORTED_CONTINUE_ON_FAILURE_DELETING_OLD_DB
      dsnFilePath: Option[Path] = None,       // K4 PgBouncer routing file
      defaultTz: String = "UTC",
      materializeViews: Boolean = false,      // write V1/V2 into the import (gtfs-via-postgres materialized views)
      now: () => Long = () => System.currentTimeMillis() / 1000)

  /** K6: the structured result object (import.js:83-90). */
  final case class Result(
      downloadDurationMs: Long,
      deletedDatabases: Seq[String],
      retainedDatabases: Seq[String],
      importSkipped: Boolean,
      newImport: Option[SuccessfulImport],
      importDurationMs: Long)

  /** The full atomic import. Mirrors the step order of import.js:38-324. */
  def importGtfsAtomically(spark: SparkSession, cfg: Config): Result = {
    val store = MetaStore(cfg.storeRoot.toString)
    val t0 = System.nanoTime()

    // S1: download/stage the feed into the tmp dir (driver-side; the
    // reference shells out to curl-mirror, download.sh:25-29). With a
    // feedUrl the mirror fetch (conditional, UA-mandatory) runs first.
    Files.createDirectories(cfg.tmpDir)
    val source = cfg.feedUrl match {
      case Some(url) =>
        Download.download(url, cfg.tmpDir.resolve("gtfs.zip"), cfg.userAgent).path
      case None => cfg.feedSource
    }
    val staged = cfg.tmpDir.resolve("gtfs-feed")
    stageFeed(source, staged)
    val downloadMs = (System.nanoTime() - t0) / 1000000

    store.acquireLockNowait() // T1 (import.js:128-132)
    try {
      val tImport = System.nanoTime()
      val recorded = store.listImports(cfg.dbPrefix)
      val allDbs = store.listDatabases(cfg.dbPrefix)

      // P3: reconcile dangling pointers — recorded imports whose DB is
      // gone are dropped with a warning (import.js:149-158).
      val live = recorded.filter(r => allDbs.contains(r.dbName))
      val dangling = recorded.filterNot(r => allDbs.contains(r.dbName))
      dangling.foreach(d => System.err.println(
        s"[import] warning: recorded import ${d.dbName} has no database — dropping record"))

      // T4: retention — drop everything not retained, including orphan
      // dirs from aborted imports (import.js:160-198).
      val retained = cfg.determineDbsToRetain(live, allDbs)
      val victims = allDbs.filterNot(retained.contains)
      val deleted = victims.flatMap { v =>
        try { store.dropDatabase(v); Some(v) }
        catch {
          case NonFatal(e) if cfg.continueOnDeleteFailure =>
            System.err.println(s"[import] warning: failed deleting $v: ${e.getMessage}")
            None
        }
      }

      // H3/P6: composite digest of feed + postprocessing scripts.
      val feedDigest = Digests.compositeFeedDigest(
        feedArchiveOrDirDigestSource(staged), cfg.postprocessingDir)

      // persist the reconciliation + retention effects, then decide skip
      val latest = live.filter(i => retained.contains(i.dbName))
        .sortBy(-_.importedAt).headOption

      // P5: skip-if-unchanged (import.js:235-239).
      if (latest.exists(_.feedDigest == feedDigest)) {
        store.transact { _ =>
          (live.filterNot(r => deleted.contains(r.dbName)).toVector, ())
        }
        return Result(downloadMs, deleted, retained, importSkipped = true,
          None, (System.nanoTime() - tImport) / 1000000)
      }

      // H4/K5: fresh DB (import.js:246-247) on the DDL "connection".
      val importedAt = cfg.now()
      val dbName = Digests.formatDbName(cfg.dbPrefix, importedAt, feedDigest)
      val dbPath = store.createDatabase(dbName)

      try {
        // S2/S3: unzip + schema'd CSV scan; C19 preprocess hook;
        // C1-C16 cleaning; K1 load (parquet per entity).
        val extractDir = cfg.tmpDir.resolve("extracted")
        extractFeed(staged, extractDir)
        implicit val s: SparkSession = spark
        var feed = readFeed(spark, extractDir)
        feed = lowerLangCodes(feed)           // L2 (import.sh:125)
        feed = cfg.preprocess.map(_(feed)).getOrElse(feed)
        feed = Clean(feed, cfg.cleanConfig)
        writeFeed(feed, dbPath)
        // L4: import metadata
        Views.importMetadata(spark, feedDigest, importedAt, cfg.dbPrefix)
          .write.mode("overwrite").parquet(dbPath.resolve("import_metadata").toString)
        // materialized consumer views (gtfs-via-postgres materializes
        // service_days; arrivals_departures partitioned by service date
        // gives date-ranged departure boards partition pruning)
        if (cfg.materializeViews) {
          Views.serviceDays(feed).write.mode("overwrite")
            .parquet(dbPath.resolve("service_days").toString)
          Views.materializeArrivalsDepartures(feed,
            dbPath.resolve("arrivals_departures").toString, cfg.defaultTz)
        }
        // postprocessing.d SQL analog (import.sh:134-148): each script
        // runs against the imported entity views, in order.
        if (cfg.postprocessSql.nonEmpty) {
          registerViews(spark, dbPath)
          cfg.postprocessSql.foreach(spark.sql(_).collect())
        }

        // K2 + K4 + T5: stage the commit record, write the DSN file,
        // publish atomically (import.js:279-311).
        val rec = SuccessfulImport(dbName, importedAt, feedDigest)
        cfg.dsnFilePath.foreach(p => store.writeDsnFile(p, dbName))
        store.transact { _ =>
          val next = live.filterNot(r => deleted.contains(r.dbName)).toVector :+ rec
          (next, ())
        }
        Result(downloadMs, deleted, retained :+ dbName, importSkipped = false,
          Some(rec), (System.nanoTime() - tImport) / 1000000)
      } catch {
        case NonFatal(e) =>
          // ROLLBACK: nothing was published; the fresh dir stays as an
          // orphan for the next run's retention pass (T3/T6).
          throw e
      }
    } finally {
      store.releaseLock()
    }
  }

  /** Consumer path (SURVEY.md §3.3): resolve the newest import and
    * register its entity tables + views under stable names — the "DSN
    * swap" as a view re-registration. */
  def openLatestImport(spark: SparkSession, storeRoot: Path, dbPrefix: String): Option[String] = {
    val store = MetaStore(storeRoot.toString)
    store.listImports(dbPrefix).headOption.map { latest =>
      registerViews(spark, store.databasePath(latest.dbName))
      latest.dbName
    }
  }

  // ---- helpers ------------------------------------------------------

  private def stageFeed(src: Path, dst: Path): Unit = {
    if (Files.exists(dst)) deleteRecursively(dst)
    if (Files.isDirectory(src)) copyRecursively(src, dst)
    else Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
  }

  /** For digesting: a zip digests as the file; a directory digests as
    * the concatenation of its entry digests via a synthetic listing
    * file (deterministic). */
  private def feedArchiveOrDirDigestSource(staged: Path): Path =
    if (!Files.isDirectory(staged)) staged
    else {
      val listing = staged.resolveSibling(staged.getFileName.toString + ".digest-listing")
      val entries = Using.resource(Files.list(staged)) {
        _.iterator().asScala.toSeq.filter(Files.isRegularFile(_))
          .sortBy(_.getFileName.toString)
      }
      val content = entries.map(p =>
        s"${p.getFileName}\t${Digests.digestFile(p)}").mkString("\n")
      Files.writeString(listing, content)
      listing
    }

  private def extractFeed(staged: Path, dst: Path): Unit = {
    if (Files.exists(dst)) deleteRecursively(dst) // rm -rf first (import.sh:20)
    Files.createDirectories(dst)
    if (Files.isDirectory(staged)) copyRecursively(staged, dst)
    else Using.resource(new ZipFile(staged.toFile)) { zf =>
      zf.entries().asScala.filterNot(_.isDirectory).foreach { e =>
        val out = dst.resolve(Paths.get(e.getName).getFileName.toString)
        Using.resource(zf.getInputStream(e)) { in =>
          Files.copy(in, out, StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
  }

  /** S3: read every present entity with its declared schema. */
  def readFeed(spark: SparkSession, dir: Path): Clean.Feed =
    Schemas.all.keys.toSeq.sorted.flatMap { entity =>
      val f = dir.resolve(s"$entity.txt")
      if (Files.exists(f)) Some(entity -> Schemas.readEntity(spark, dir.toString, entity))
      else None
    }.toMap

  /** L2 --lower-case-lang-codes (import.sh:125). */
  def lowerLangCodes(feed: Clean.Feed): Clean.Feed =
    feed.map {
      case ("feed_info", df) if df.columns.contains("feed_lang") =>
        "feed_info" -> df.withColumn("feed_lang", lower(col("feed_lang")))
      case ("translations", df) if df.columns.contains("language") =>
        "translations" -> df.withColumn("language", lower(col("language")))
      case ("agency", df) if df.columns.contains("agency_lang") =>
        "agency" -> df.withColumn("agency_lang", lower(col("agency_lang")))
      case (n, df) => n -> df
    }

  /** K1: bulk load — parquet per entity into the fresh DB dir. The
    * write-staging-then-publish split is the `sponge` materialization
    * barrier analog (import.sh:131). */
  private def writeFeed(feed: Clean.Feed, dbPath: Path): Unit =
    feed.foreach { case (entity, df) =>
      df.write.mode("overwrite").parquet(dbPath.resolve(entity).toString)
    }

  /** gtfsclean output parity: write the cleaned feed back as GTFS CSV
    * files (`<entity>.txt`), one per entity — the `tidied.gtfs`
    * directory the reference's cleaning stage produces
    * (/root/reference/import.sh:105-110, $tidied_path lib.sh:14).
    * Executors write the shards; the driver concatenates them into the
    * single .txt the GTFS spec requires (header once). */
  def writeFeedCsv(feed: Clean.Feed, dir: Path): Unit = {
    Files.createDirectories(dir)
    feed.foreach { case (entity, df) =>
      val shardDir = dir.resolve(s".$entity.csv-shards")
      df.write.mode("overwrite").option("header", "true")
        .csv(shardDir.toString)
      val target = dir.resolve(s"$entity.txt")
      val shards = Using.resource(Files.list(shardDir)) {
        _.iterator().asScala.toSeq
          .filter(_.getFileName.toString.endsWith(".csv")).sortBy(_.toString)
      }
      Using.resource(Files.newBufferedWriter(target)) { w =>
        var wroteHeader = false
        shards.foreach { shard =>
          val lines = Files.readAllLines(shard)
          if (!lines.isEmpty) {
            val body = if (wroteHeader) lines.asScala.drop(1) else lines.asScala
            body.foreach { l => w.write(l); w.newLine() }
            wroteHeader = true
          }
        }
        // empty result: still emit the header row from the schema
        if (!wroteHeader) { w.write(df.columns.mkString(",")); w.newLine() }
      }
      deleteRecursively(shardDir)
    }
  }

  private def registerViews(spark: SparkSession, dbPath: Path): Unit =
    Using.resource(Files.list(dbPath)) {
      _.iterator().asScala.filter(Files.isDirectory(_)).foreach { p =>
        spark.read.parquet(p.toString)
          .createOrReplaceTempView(p.getFileName.toString)
      }
    }

  private def deleteRecursively(p: Path): Unit =
    Using.resource(Files.walk(p)) { w =>
      w.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
    }

  private def copyRecursively(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst)
    Using.resource(Files.list(src)) {
      _.iterator().asScala.filter(Files.isRegularFile(_)).foreach { f =>
        Files.copy(f, dst.resolve(f.getFileName.toString),
          StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }
}
