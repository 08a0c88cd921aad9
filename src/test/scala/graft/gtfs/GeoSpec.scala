package graft.gtfs

import graft.SparkSpec
import Geo.Pt

/** SURVEY.md §5.2: Douglas-Peucker invariants (property over seeded
  * random polylines: every original point within ε of the simplified
  * polyline) + haversine sanity + KNN. */
class GeoSpec extends SparkSpec {

  test("DP drops collinear interior points, keeps endpoints") {
    val line = IndexedSeq(Pt(1, 52.5, 13.30), Pt(2, 52.5, 13.35),
      Pt(3, 52.5, 13.40), Pt(4, 52.5, 13.45))
    val out = Geo.douglasPeucker(line, 1e-6)
    assert(out == IndexedSeq(line.head, line.last))
  }

  test("DP keeps a significant detour point") {
    val line = IndexedSeq(Pt(1, 0.0, 0.0), Pt(2, 1.0, 0.5), Pt(3, 0.0, 1.0))
    val out = Geo.douglasPeucker(line, 0.1)
    assert(out == line)
  }

  test("DP property: every original point within eps of simplified line") {
    val rnd = new scala.util.Random(42)
    val eps = 0.05
    (1 to 100).foreach { _ =>
      val n = 2 + rnd.nextInt(40)
      val line = IndexedSeq.tabulate(n)(i =>
        Pt(i, rnd.nextDouble() * 2 - 1, rnd.nextDouble() * 2 - 1))
      val simp = Geo.douglasPeucker(line, eps)
      assert(simp.head == line.head && simp.last == line.last)
      // DP invariant: every dropped point lies within eps of the LINE
      // through the kept pair that spans it
      simp.sliding(2).foreach { case Seq(a, b) =>
        line.filter(p => p.seq > a.seq && p.seq < b.seq).foreach { p =>
          val d = lineDist(p, a, b)
          assert(d <= eps + 1e-9, s"point $p at $d > $eps between $a and $b")
        }
      }
    }
  }

  private def lineDist(p: Pt, a: Pt, b: Pt): Double = {
    val dx = b.lon - a.lon; val dy = b.lat - a.lat
    val norm = math.sqrt(dx * dx + dy * dy)
    if (norm == 0) math.hypot(p.lon - a.lon, p.lat - a.lat)
    else math.abs(dy * p.lon - dx * p.lat + b.lon * a.lat - b.lat * a.lon) / norm
  }

  test("haversine: Berlin Hbf → Alexanderplatz ≈ 3.1 km") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = Seq((52.5250, 13.3690, 52.5219, 13.4132)).toDF("a", "b", "c", "d")
      .select(Geo.haversineMeters(col("a"), col("b"), col("c"), col("d")))
      .as[Double].head()
    assert(d > 2800 && d < 3300, s"got $d m")
  }

  test("stopsByDistance returns k nearest in order") {
    import spark.implicits._
    val stops = Seq(
      ("near", 52.521, 13.410), ("mid", 52.530, 13.420),
      ("far", 53.000, 14.000), ("self", 52.5219, 13.4132))
      .toDF("stop_id", "stop_lat", "stop_lon")
    val out = Geo.stopsByDistance(stops, 52.5219, 13.4132, 2)
      .select("stop_id").as[String].collect().toSeq
    assert(out == Seq("self", "near"))
  }
}
