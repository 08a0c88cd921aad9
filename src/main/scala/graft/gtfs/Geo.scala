package graft.gtfs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geometry operators: haversine distance (the KNN path behind the
  * generated `get_stops_by_distance` API, SURVEY.md §2.8 Q6 / L3) and
  * Douglas-Peucker polyline simplification (gtfsclean --min-shapes,
  * /root/reference/import.sh:71-73, SURVEY.md C7).
  */
object Geo {

  private val EarthRadiusM = 6371008.8

  /** Haversine distance in meters between two (lat, lon) pairs, as a
    * codegen'd column expression (no UDF). */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusM) * asin(sqrt(a))
  }

  /** Coarse spatial bucket (the L3 GiST-index analog): a lat/lon grid
    * cell id at ~0.1° resolution. Persisting stops clustered by this key
    * (repartitionByRange + sortWithinPartitions) gives KNN queries a
    * prune key: only the query point's cell + 8 neighbors are scanned.
    */
  def gridCell(lat: Column, lon: Column): Column =
    concat(floor(lat * 10).cast("long").cast("string"), lit(":"),
      floor(lon * 10).cast("long").cast("string"))

  /** K nearest stops to (lat, lon): exact haversine ordering with an
    * optional bounding-box prefilter that keeps the scan prunable. The
    * full cross-product is never materialized — filter then top-k. */
  def stopsByDistance(stops: DataFrame, lat: Double, lon: Double, k: Int,
      prefilterDeg: Double = 1.0): DataFrame = {
    stops
      .where(col("stop_lat").between(lat - prefilterDeg, lat + prefilterDeg) &&
        col("stop_lon").between(lon - prefilterDeg, lon + prefilterDeg))
      .withColumn("distance_m",
        haversineMeters(lit(lat), lit(lon), col("stop_lat"), col("stop_lon")))
      .orderBy(asc("distance_m"), asc("stop_id"))
      .limit(k)
  }

  /** L3 (--stops-location-index) materialized: persist stops
    * partitioned by grid cell, range-clustered and sorted within
    * partitions. KNN readers then touch only the query's cell
    * neighborhood — directory-level partition pruning standing in for
    * the GiST index (/root/reference/import.sh:126). */
  def writeStopsClustered(stops: DataFrame, path: String): Unit =
    stops
      .withColumn("cell", gridCell(col("stop_lat"), col("stop_lon")))
      .repartitionByRange(col("cell"))
      .sortWithinPartitions("cell", "stop_id")
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** KNN over the clustered layout: read only the 3×3 cell
    * neighborhood of the query point (partition pruning — the scan's
    * PartitionFilters), then exact haversine re-rank. */
  def stopsByDistanceClustered(spark: org.apache.spark.sql.SparkSession,
      path: String, lat: Double, lon: Double, k: Int): DataFrame = {
    val la = math.floor(lat * 10).toLong
    val lo = math.floor(lon * 10).toLong
    val cells = for (dLa <- -1L to 1L; dLo <- -1L to 1L)
      yield s"${la + dLa}:${lo + dLo}"
    spark.read.parquet(path)
      .where(col("cell").isin(cells: _*))
      .withColumn("distance_m",
        haversineMeters(lit(lat), lit(lon), col("stop_lat"), col("stop_lon")))
      .orderBy(asc("distance_m"), asc("stop_id"))
      .limit(k)
  }

  final case class Pt(seq: Int, lat: Double, lon: Double)

  /** Douglas-Peucker simplification of one polyline, preserving shape
    * within `epsilonDeg` (perpendicular distance in degree space, the
    * gtfsclean default behavior). Iterative stack (no recursion depth
    * risk on long shapes); endpoints always kept. Driver/executor-side
    * plain Scala — invoked per shape group via flatMapGroups in
    * [[Clean.minShapes]] where the group (one shape's points) is
    * bounded (thousands of points, never fact-scale). */
  def douglasPeucker(points: IndexedSeq[Pt], epsilonDeg: Double): IndexedSeq[Pt] = {
    if (points.length <= 2) return points
    val keep = Array.fill(points.length)(false)
    keep(0) = true; keep(points.length - 1) = true
    val stack = scala.collection.mutable.Stack((0, points.length - 1))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.pop()
      if (hi > lo + 1) {
        var maxD = -1.0; var maxI = -1
        var i = lo + 1
        while (i < hi) {
          val d = perpDistance(points(i), points(lo), points(hi))
          if (d > maxD) { maxD = d; maxI = i }
          i += 1
        }
        if (maxD > epsilonDeg) {
          keep(maxI) = true
          stack.push((lo, maxI)); stack.push((maxI, hi))
        }
      }
    }
    points.indices.collect { case i if keep(i) => points(i) }.toIndexedSeq
  }

  /** Perpendicular distance from p to segment (a, b) in degree space.
    * The degenerate branch uses plain sqrt(x²+y²), NOT Math.hypot:
    * hypot's extra-precision rounding has no SQL equivalent, and the
    * c7 DuckDB oracle replays this exact expression — every operation
    * here (-, *, +, abs, /, sqrt) is IEEE exact-rounded and therefore
    * bit-identical across engines when written in the same order. */
  private def perpDistance(p: Pt, a: Pt, b: Pt): Double = {
    val dx = b.lon - a.lon; val dy = b.lat - a.lat
    val norm = math.sqrt(dx * dx + dy * dy)
    if (norm == 0) {
      val ex = p.lon - a.lon; val ey = p.lat - a.lat
      math.sqrt(ex * ex + ey * ey)
    } else math.abs(dy * p.lon - dx * p.lat + b.lon * a.lat - b.lat * a.lon) / norm
  }
}
