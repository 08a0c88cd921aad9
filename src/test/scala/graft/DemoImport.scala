package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.gtfs.{TestFeed, Views, Clean}
import graft.pipeline.Import
import graft.meta.MetaStore

/** Smoke harness: drives the full import pipeline end-to-end through
  * the public API against the fixture feed, then queries the consumer
  * views of the published import — the library-boundary equivalent of
  * running the reference's `node importer.js` and then hitting the
  * generated views. Run: sbt "Test/runMain graft.DemoImport" */
object DemoImport {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = Files.createTempDirectory("demo-store")
    val feed = TestFeed.writeTo(Files.createTempDirectory("demo-feed"))
    val cfg = Import.Config(
      feedSource = feed, storeRoot = root, dbPrefix = "gtfs_",
      tmpDir = root.resolve("tmp"),
      dsnFilePath = Some(root.resolve("dsn.txt")))

    val r1 = Import.importGtfsAtomically(spark, cfg)
    println(s"[demo] import 1: skipped=${r1.importSkipped} db=${r1.newImport.map(_.dbName)}")
    val r2 = Import.importGtfsAtomically(spark, cfg)
    println(s"[demo] import 2 (same feed): skipped=${r2.importSkipped}")
    println(s"[demo] dsn file: ${Files.readString(root.resolve("dsn.txt")).trim}")

    val latest = Import.openLatestImport(spark, root, "gtfs_")
    println(s"[demo] latest import: $latest")
    println("[demo] entities in published db:")
    val store = MetaStore(root.toString)
    val dbPath = store.databasePath(latest.get)
    spark.read.parquet(dbPath.resolve("trips").toString).show(10, false)

    println("[demo] arrivals_departures sample (via registered views of the import):")
    val imported = loadImportedFeed(spark, dbPath.toString)
    Views.arrivalsDepartures(imported).orderBy("svc_date", "t_departure").show(8, false)
    println("[demo] connections sample:")
    Views.connections(imported).orderBy("svc_date", "t_departure").show(5, false)
    spark.stop()
  }

  /** Load the published import's parquet entities back as a Feed. */
  private def loadImportedFeed(spark: SparkSession, dbPath: String): Clean.Feed = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(dbPath)).iterator().asScala
      .filter(java.nio.file.Files.isDirectory(_))
      .map(p => p.getFileName.toString -> spark.read.parquet(p.toString))
      .toMap - "import_metadata"
  }
}
