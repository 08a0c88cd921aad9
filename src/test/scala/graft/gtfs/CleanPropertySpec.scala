package graft.gtfs

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generative properties for the two subtle cleaning transforms:
  * C8 (minimize-services) must preserve the expanded date set exactly,
  * and C9 (minimize-stoptimes) must preserve the departure multiset
  * when folded frequencies are re-expanded. Random inputs, fixed seed. */
class CleanPropertySpec extends SparkSpec {

  implicit lazy val s: SparkSession = spark
  import spark.implicits._

  test("C8 property: expansion preserved on random calendars (10 cases)") {
    val rnd = new scala.util.Random(11)
    (1 to 10).foreach { case_i =>
      val nSvc = 1 + rnd.nextInt(5)
      val cal = (1 to nSvc).map { i =>
        val mask = Array.fill(7)(if (rnd.nextBoolean()) 1 else 0)
        if (mask.forall(_ == 0)) mask(rnd.nextInt(7)) = 1
        val start = java.time.LocalDate.of(2024, 1, 1).plusDays(rnd.nextInt(60))
        val end = start.plusDays(1 + rnd.nextInt(40))
        val f = java.time.format.DateTimeFormatter.BASIC_ISO_DATE
        (s"svc$i", mask(0), mask(1), mask(2), mask(3), mask(4), mask(5), mask(6),
          start.format(f), end.format(f))
      }
      val calDf = cal.toDF("service_id", "monday", "tuesday", "wednesday",
        "thursday", "friday", "saturday", "sunday", "start_date", "end_date")
      // random exceptions: adds possibly outside the range, removes inside
      val f = java.time.format.DateTimeFormatter.BASIC_ISO_DATE
      val cd = (1 to nSvc).flatMap { i =>
        val adds = (1 to rnd.nextInt(4)).map { _ =>
          (s"svc$i", java.time.LocalDate.of(2024, 1, 1)
            .plusDays(rnd.nextInt(120)).format(f), 1)
        }
        val removes = (1 to rnd.nextInt(3)).map { _ =>
          (s"svc$i", java.time.LocalDate.of(2024, 1, 1)
            .plusDays(rnd.nextInt(120)).format(f), 2)
        }
        adds ++ removes
      }
      val cdDf = cd.toDF("service_id", "date", "exception_type")
      val feed: Clean.Feed = Map("calendar" -> calDf, "calendar_dates" -> cdDf)

      def expansion(fd: Clean.Feed): Set[(String, String)] =
        Views.serviceDays(fd).collect()
          .map(r => (r.getString(0), r.getDate(1).toString)).toSet

      val before = expansion(feed)
      val after = expansion(Clean.minimizeServices(feed))
      assert(after == before,
        s"case $case_i: minimizeServices changed the date set " +
          s"(missing=${before -- after}, extra=${after -- before})")
    }
  }

  test("C9 property: folded frequencies re-expand to the original departures") {
    val rnd = new scala.util.Random(13)
    (1 to 12).foreach { case_i =>
      // one route/service; a headway run of m trips plus noise trips
      val m = 3 + rnd.nextInt(4)
      val headway = 300 * (1 + rnd.nextInt(6))
      val base = 6 * 3600 + rnd.nextInt(3600)
      val runT0s = (0 until m).map(j => base + j * headway)
      // an ADJACENT second run with a different headway, sharing the
      // boundary trip pattern (the dangling-frequencies regression)
      val h2 = 300 * (7 + rnd.nextInt(3))
      val run2T0s =
        if (rnd.nextBoolean())
          (1 to 2 + rnd.nextInt(3)).map(j => runT0s.last + j * h2)
        else Seq.empty
      val noiseT0s = (1 to rnd.nextInt(3)).map(_ => 15 * 3600 + rnd.nextInt(7200))
      def fmt(sec: Int) = f"${sec / 3600}%02d:${sec % 3600 / 60}%02d:${sec % 60}%02d"
      val allT0s = (runT0s ++ run2T0s ++ noiseT0s).distinct
      val trips = allT0s.zipWithIndex.map { case (_, i) => (f"t$i%02d", "r1", "svc1") }
        .toDF("trip_id", "route_id", "service_id")
      val st = allT0s.zipWithIndex.flatMap { case (t0, i) =>
        Seq((f"t$i%02d", fmt(t0), fmt(t0), "sA", 1),
          (f"t$i%02d", fmt(t0 + 120), fmt(t0 + 120), "sB", 2))
      }.toDF("trip_id", "arrival_time", "departure_time", "stop_id", "stop_sequence")
      val feed: Clean.Feed = Map("trips" -> trips, "stop_times" -> st)

      val folded = Clean.minimizeStopTimes(feed)
      // re-expand: departures of remaining scheduled trips + frequency
      // replicas [start, end) at headway
      val remaining = folded("stop_times").where(col("stop_sequence") === 1)
        .select(GtfsTime.toSeconds(col("departure_time")).cast("int")).as[Int]
        .collect().toSet
      val freqRows = folded.get("frequencies").map(_
        .select(GtfsTime.toSeconds(col("start_time")).cast("int"),
          GtfsTime.toSeconds(col("end_time")).cast("int"),
          col("headway_secs")).as[(Int, Int, Int)].collect().toSeq)
        .getOrElse(Seq.empty)
      val expanded = freqRows.flatMap { case (s0, s1, hw) => s0 until s1 by hw }.toSet
      // a frequency-folded exemplar's own scheduled t0 is also the first replica
      val all = remaining ++ expanded
      assert(all == allT0s.toSet,
        s"case $case_i: departures changed (missing=${allT0s.toSet -- all}, " +
          s"extra=${all -- allT0s.toSet}, freq=$freqRows)")
      // no dangling references: every frequencies.trip_id survives
      val tripIds = folded("trips").select("trip_id").as[String].collect().toSet
      val freqTrips = folded.get("frequencies")
        .map(_.select("trip_id").as[String].collect().toSet).getOrElse(Set.empty)
      assert(freqTrips.subsetOf(tripIds),
        s"case $case_i: dangling frequencies trips ${freqTrips -- tripIds}")
    }
  }
}
