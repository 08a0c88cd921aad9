package graft.gtfs

import java.nio.file.Files
import graft.SparkSpec
import graft.pipeline.Import
import org.apache.spark.sql.SparkSession

/** Derived views V1-V8 against the fixture feed (SURVEY.md §2.7). */
class ViewsSpec extends SparkSpec {

  implicit lazy val s: SparkSession = spark

  private lazy val feed: Clean.Feed = {
    val dir = TestFeed.writeTo(Files.createTempDirectory("feedv"))
    Import.readFeed(spark, dir)
  }

  test("V1 service_days: weekly mask + added − removed") {
    val days = Views.serviceDays(feed).where("service_id = 'svc1'")
      .collect().map(_.getDate(1).toString).toSet
    // Mon-Fri 2024-03-04..03-15 = 10 weekdays, +03-09 (Sat), −03-11 (Mon)
    assert(days.size == 10)
    assert(days.contains("2024-03-09"), "exception_type=1 added")
    assert(!days.contains("2024-03-11"), "exception_type=2 removed")
    assert(!days.contains("2024-03-10"), "Sunday masked out")
    assert(days.contains("2024-03-04") && days.contains("2024-03-15"))
  }

  test("V3 frequency expansion is half-open [start, end)") {
    import spark.implicits._
    val ad = Views.arrivalsDepartures(feed, "UTC")
    // t4: headway 1200 in [07:00, 08:00) local → replicas 07:00, 07:20,
    // 07:40 (NOT 08:00); agency tz is Europe/Berlin (CET = UTC+1 in
    // early March) so UTC shows 06:00/06:20/06:40
    val deps = ad.where("trip_id = 't4' and stop_sequence = 1 and svc_date = date'2024-03-04'")
      .select(date_format_utc("t_departure")).as[String].collect().sorted.toSeq
    assert(deps == Seq("2024-03-04 06:00:00", "2024-03-04 06:20:00",
      "2024-03-04 06:40:00"))
  }

  private def date_format_utc(c: String) =
    org.apache.spark.sql.functions.date_format(
      org.apache.spark.sql.functions.col(c), "yyyy-MM-dd HH:mm:ss")

  test("V2 arrivals_departures: >24:00 time lands on the next calendar day") {
    import spark.implicits._
    val ad = Views.arrivalsDepartures(feed, "UTC")
    val arr = ad.where("trip_id = 't3' and stop_sequence = 1 and svc_date = date'2024-03-04'")
      .select(date_format_utc("t_arrival")).as[String].head()
    // 25:10 on service day 03-04 = 01:10 on 03-05 (in the fixture the
    // agency tz is Europe/Berlin; with feed tz this shifts by -1h)
    assert(arr == "2024-03-05 00:10:00", // 01:10 Berlin = 00:10 UTC
      s"got $arr")
  }

  test("V2 station rollup: child stops resolve to their parent station") {
    import spark.implicits._
    val ad = Views.arrivalsDepartures(feed, "UTC")
    val s1 = ad.where("stop_id = 's1'").select("station_id").distinct()
      .as[String].collect().toSeq
    assert(s1 == Seq("st1"), "s1 is a child of station st1")
    val s2 = ad.where("stop_id = 's2'").select("station_id").distinct()
      .as[String].collect().toSeq
    assert(s2 == Seq("s2"), "stand-alone stop is its own station")
  }

  test("V6b stats by route/stop/hour counts departures") {
    import spark.implicits._
    val st = Views.statsByRouteStopHour(feed, "UTC")
      .where("stop_id = 's1'")
    assert(st.count() > 0)
    val total = st.agg(org.apache.spark.sql.functions.sum("n_departures"))
      .as[Long].head()
    assert(total > 0)
  }

  test("V4 connections: consecutive stop pairs per trip") {
    import spark.implicits._
    val conns = Views.connections(feed, "UTC")
      .where("trip_id = 't1' and svc_date = date'2024-03-04'")
      .select("from_stop_id", "to_stop_id").as[(String, String)].collect().toSet
    assert(conns == Set(("s1", "s2"), ("s2", "s3")))
  }

  test("V5 shapes_aggregated produces ordered WKT linestrings") {
    import spark.implicits._
    val wkt = Views.shapesAggregated(feed).where("shape_id = 'sh1'")
      .select("wkt").as[String].head()
    assert(wkt == "LINESTRING(13.3 52.5,13.35 52.5,13.4 52.5,13.45 52.5)")
  }

  test("V6 stats count trips and stop events per route and day") {
    import spark.implicits._
    val row = Views.statsByRouteDate(feed, "UTC")
      .where("svc_date = date'2024-03-04'")
      .select("n_stop_events", "n_trips").as[(Long, Long)].collect()
    assert(row.nonEmpty)
    assert(row.map(_._1).sum > 0)
  }

  test("V7 active trips by hour covers the service hours") {
    val hours = Views.activeTripsByHour(feed, "UTC")
    assert(hours.count() > 0)
    import spark.implicits._
    val total = hours.agg(org.apache.spark.sql.functions.sum("n_active_trips"))
      .as[Long].head()
    assert(total > 0)
  }

  test("V6b hour buckets are agency-LOCAL hours (23:30 Berlin → 23, not UTC 22)") {
    import spark.implicits._
    // single-trip feed departing 23:30 local on a CET (UTC+1) date:
    // the UTC event time is 22:30, so a UTC-hour bucketing would yield
    // 22 — gtfs-via-postgres's stats family buckets by local time.
    val files = Map(
      "agency.txt" ->
        "agency_id,agency_name,agency_url,agency_timezone\na1,M,https://m,Europe/Berlin\n",
      "routes.txt" -> "route_id,agency_id,route_short_name,route_type\nr1,a1,X,1\n",
      "trips.txt" -> "trip_id,route_id,service_id\nt1,r1,svc\n",
      "stops.txt" -> "stop_id,stop_name,stop_lat,stop_lon\nsx,A,52.5,13.4\n",
      "stop_times.txt" ->
        "trip_id,arrival_time,departure_time,stop_id,stop_sequence\nt1,23:30:00,23:30:00,sx,1\n",
      "calendar.txt" ->
        ("service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date\n" +
          "svc,1,1,1,1,1,1,1,20240304,20240304\n"))
    val dir = Files.createTempDirectory("feedlocalhr")
    files.foreach { case (n, c) => Files.writeString(dir.resolve(n), c) }
    val f = Import.readFeed(spark, dir)
    val hrs = Views.statsByRouteStopHour(f).select("dep_hour").as[Int].collect().toSeq
    assert(hrs == Seq(23), s"expected local hour 23, got $hrs")
  }

  test("trips whose frequencies rows are ALL invalid keep their scheduled run") {
    import spark.implicits._
    // t1 gains an invalid frequencies row (headway_secs=0). It must NOT
    // vanish from arrivals_departures: invalid rows don't replace the
    // scheduled stop_times (shift 0 fallback).
    val dir = TestFeed.writeTo(Files.createTempDirectory("feedinvfreq"),
      _.updated("frequencies.txt",
        """trip_id,start_time,end_time,headway_secs,exact_times
          |t4,07:00:00,08:00:00,1200,1
          |t1,07:00:00,08:00:00,0,1
          |""".stripMargin))
    val f = Import.readFeed(spark, dir)
    val t1 = Views.arrivalsDepartures(f, "UTC")
      .where("trip_id = 't1' and svc_date = date'2024-03-04'")
    assert(t1.count() == 3, "t1's 3 scheduled stop events survive")
    val shifts = t1.select("shift").distinct().as[Long].collect().toSeq
    assert(shifts == Seq(0L), "invalid frequencies → scheduled run (shift 0)")
  }

  test("V7 counts each frequency replica as its own active trip") {
    import spark.implicits._
    // t4's 3 replicas (07:00/07:20/07:40 Berlin = 06:xx UTC on
    // 2024-03-04) all overlap UTC hour 6 → that bucket counts ≥ 3.
    val bucket = java.time.Instant.parse("2024-03-04T06:00:00Z")
      .getEpochSecond / 3600
    val n = Views.activeTripsByHour(feed, "UTC")
      .where(org.apache.spark.sql.functions.col("hour_bucket") === bucket)
      .select("n_active_trips").as[Long].head()
    assert(n >= 3, s"3 concurrent replicas must count separately, got $n")
  }

  test("V8 translations join with lower-cased language codes") {
    import spark.implicits._
    val t = Views.translatedStopNames(feed)
      .where("stop_id = 's2' and language = 'de'")
      .select("stop_name_translated").as[String].collect()
    assert(t.toSeq == Seq("Alexanderplatz Bhf"))
  }

  test("V8 generic: record_sub_id scoping, field_value matching, id-over-value precedence") {
    import spark.implicits._
    val ns = null.asInstanceOf[String]
    val stopTimes = Seq(("t1", 1, "HBF"), ("t1", 2, "ALEX"), ("t2", 1, "HBF"))
      .toDF("trip_id", "stop_sequence", "stop_headsign")
    val routes = Seq(("r1", "Ring"), ("r2", "Cross"))
      .toDF("route_id", "route_long_name")
    val tr = Seq(
      // record_id + record_sub_id: addresses ONLY (t1, seq 2)
      ("stop_times", "stop_headsign", "DE", "Alexplatz", "t1", "2", ns),
      // record_id with NULL sub: every sub-record of t2
      ("stop_times", "stop_headsign", "DE", "Hauptbahnhof", "t2", ns, ns),
      // value-addressed: every route whose long name is "Ring"
      ("routes", "route_long_name", "FR", "Anneau_val", ns, ns, "Ring"),
      // id-addressed row for the SAME (record, language) → must win
      ("routes", "route_long_name", "FR", "Anneau_id", "r1", ns, ns))
      .toDF("table_name", "field_name", "language", "translation",
        "record_id", "record_sub_id", "field_value")
    val f: Clean.Feed = Map(
      "stop_times" -> stopTimes, "routes" -> routes, "translations" -> tr)

    val st = Views.translateField(f, "stop_times", "stop_headsign")
      .select("record_key", "record_sub_key", "language", "stop_headsign_translated")
      .as[(String, String, String, String)].collect().toSet
    assert(st == Set(
      ("t1", "2", "de", "Alexplatz"),    // sub-scoped hit
      ("t1", "1", null, "HBF"),          // sub-scoped row does NOT leak to seq 1
      ("t2", "1", "de", "Hauptbahnhof")  // null sub covers all of t2
    ), s"got $st")

    val rt = Views.translateField(f, "routes", "route_long_name")
      .select("record_key", "language", "route_long_name_translated")
      .as[(String, String, String)].collect().toSet
    assert(rt == Set(
      ("r1", "fr", "Anneau_id"),  // id beats value for the same (record, lang)
      ("r2", null, "Cross")       // untranslated fallback row
    ), s"got $rt")
  }

  test("V8 generic: tables without a record key resolve by field value") {
    import spark.implicits._
    val ns = null.asInstanceOf[String]
    val feedInfo = Seq(Tuple1("My Feed")).toDF("feed_publisher_name")
    val tr = Seq(
      ("feed_info", "feed_publisher_name", "DE", "Mein Feed", ns, ns, "My Feed"))
      .toDF("table_name", "field_name", "language", "translation",
        "record_id", "record_sub_id", "field_value")
    val out = Views.translateField(
      Map("feed_info" -> feedInfo, "translations" -> tr),
      "feed_info", "feed_publisher_name")
      .select("language", "feed_publisher_name_translated")
      .as[(String, String)].collect().toSet
    assert(out == Set(("de", "Mein Feed")), s"got $out")
  }
}
