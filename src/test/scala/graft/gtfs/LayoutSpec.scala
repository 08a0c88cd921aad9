package graft.gtfs

import java.nio.file.Files
import graft.SparkSpec
import graft.pipeline.Import
import org.apache.spark.sql.SparkSession

/** Physical-layout strategies: the L3 clustered-stops index analog and
  * the partition-by-date V2 materialization — both must show directory-
  * level partition pruning (PartitionFilters) in the scan, not just a
  * post-scan filter. */
class LayoutSpec extends SparkSpec {

  implicit lazy val s: SparkSession = spark
  import spark.implicits._

  test("L3: clustered stops layout prunes partitions and matches brute force") {
    val rnd = new scala.util.Random(1)
    val stops = (1 to 2000).map { i =>
      (f"s$i%04d", 50.0 + rnd.nextDouble() * 5, 10.0 + rnd.nextDouble() * 5)
    }.toDF("stop_id", "stop_lat", "stop_lon")
    val path = Files.createTempDirectory("stops-clustered").toString
    Geo.writeStopsClustered(stops, path)

    val knn = Geo.stopsByDistanceClustered(spark, path, 52.5, 12.5, 5)
    val plan = knn.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected partition pruning on cell:\n$plan")

    val exact = Geo.stopsByDistance(stops, 52.5, 12.5, 5, prefilterDeg = 0.1)
      .select("stop_id").as[String].collect().toSeq
    val clustered = knn.select("stop_id").as[String].collect().toSeq
    assert(clustered == exact, "clustered KNN must match the exact top-k")
  }

  test("V2 materialization partition-prunes date-ranged reads") {
    val dir = TestFeed.writeTo(Files.createTempDirectory("feedmat"))
    val feed = Import.readFeed(spark, dir)
    val out = Files.createTempDirectory("ad-mat").toString
    Views.materializeArrivalsDepartures(feed, out)
    val ranged = Views.arrivalsInRange(spark, out, "2024-03-04", "2024-03-05")
    val plan = ranged.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("svc_date"),
      s"expected partition pruning on svc_date:\n$plan")
    assert(ranged.count() > 0)
    // only the two requested days survive
    val days = ranged.select("svc_date").distinct()
      .as[java.sql.Date].collect().map(_.toString).toSet
    assert(days.subsetOf(Set("2024-03-04", "2024-03-05")))
  }
}
