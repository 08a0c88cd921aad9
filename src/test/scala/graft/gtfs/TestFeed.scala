package graft.gtfs

import java.nio.file.{Files, Path}

/** The synthetic GTFS fixture of FIXTURES.md §B: a minimal feed
  * exercising every cleaning transform (C1-C16) and view (V1-V8).
  * Written as real CSV files so the full S2→S3→clean→load path runs. */
object TestFeed {

  val files: Map[String, String] = Map(
    // a2 duplicates a1 on all attrs (→ C11); Europe/Berlin for DST tests
    "agency.txt" ->
      """agency_id,agency_name,agency_url,agency_timezone,agency_lang
        |a1,Metro,https://metro.example,Europe/Berlin,DE
        |a2,Metro,https://metro.example,Europe/Berlin,DE
        |""".stripMargin,
    // s9dup duplicates s2 (→ C15); szero has (0,0) coords (→ C4);
    // st1 is a station with child s1 (left-outer path)
    "stops.txt" ->
      """stop_id,stop_name,stop_lat,stop_lon,location_type,parent_station
        |s1,Hauptbahnhof,52.5250,13.3690,0,st1
        |s2,Alexanderplatz,52.5219,13.4132,0,
        |s3,Zoologischer Garten,52.5072,13.3323,0,
        |s9dup,Alexanderplatz,52.5219,13.4132,0,
        |szero,Broken GPS,0,0,0,
        |st1,Hauptbahnhof Station,52.5251,13.3694,1,
        |""".stripMargin,
    // r2 references the duplicate agency a2; after C11 remap both rows
    // are attribute-equal (→ C12)
    "routes.txt" ->
      """route_id,agency_id,route_short_name,route_type
        |r1,a1,U1,1
        |r2,a2,U1,1
        |""".stripMargin,
    // t2 duplicates t1's stop-time sequence (→ C16); t3 has no shape
    // (L1); torphan references a missing service (→ C10);
    // t5/t6/t7 repeat t4's pattern at constant 1800s headway (→ C9)
    "trips.txt" ->
      """trip_id,route_id,service_id,shape_id
        |t1,r1,svc1,sh1
        |t2,r2,svc1,sh2
        |t3,r1,svc1,
        |t4,r1,svc1,sh2
        |t5,r1,svc1,
        |t6,r1,svc1,
        |t7,r1,svc1,
        |torphan,r1,svcmissing,
        |""".stripMargin,
    // t3 has >24:00:00 times (V2 hard part); ≥3 stops per trip (V4)
    "stop_times.txt" ->
      """trip_id,arrival_time,departure_time,stop_id,stop_sequence
        |t1,08:00:00,08:00:30,s1,1
        |t1,08:10:00,08:10:30,s2,2
        |t1,08:20:00,08:20:30,s3,3
        |t2,08:00:00,08:00:30,s1,1
        |t2,08:10:00,08:10:30,s2,2
        |t2,08:20:00,08:20:30,s3,3
        |t3,25:10:00,25:10:00,s2,1
        |t3,25:20:00,25:20:00,s3,2
        |t4,07:00:00,07:00:00,s1,1
        |t4,07:05:00,07:05:00,s2,2
        |t5,09:00:00,09:00:00,s1,1
        |t5,09:05:00,09:05:00,s2,2
        |t6,09:30:00,09:30:00,s1,1
        |t6,09:35:00,09:35:00,s2,2
        |t7,10:00:00,10:00:00,s1,1
        |t7,10:05:00,10:05:00,s2,2
        |torphan,06:00:00,06:00:00,s1,1
        |torphan,06:10:00,06:10:00,s2,2
        |""".stripMargin,
    // svc1: Mon-Fri over two weeks of March 2024 (DST-day anchoring is
    // unit-tested directly in GtfsTimeSpec); svc2/svc3 end with
    // identical date sets (→ C13)
    "calendar.txt" ->
      """service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date
        |svc1,1,1,1,1,1,0,0,20240304,20240315
        |""".stripMargin,
    // one added Saturday + one removed Monday for svc1 (→ V1);
    // svc2 and svc3: identical single-date sets (→ C13)
    "calendar_dates.txt" ->
      """service_id,date,exception_type
        |svc1,20240309,1
        |svc1,20240311,2
        |svc2,20240310,1
        |svc3,20240310,1
        |""".stripMargin,
    // t4 runs every 1200s in [07:00, 08:00) → replicas at 07:00, 07:20,
    // 07:40 (V3 half-open)
    "frequencies.txt" ->
      """trip_id,start_time,end_time,headway_secs,exact_times
        |t4,07:00:00,08:00:00,1200,1
        |""".stripMargin,
    // sh1: collinear interior points (→ C7 must drop them);
    // sh2 identical polyline (→ C14)
    "shapes.txt" ->
      """shape_id,shape_pt_lat,shape_pt_lon,shape_pt_sequence
        |sh1,52.5,13.30,1
        |sh1,52.5,13.35,2
        |sh1,52.5,13.40,3
        |sh1,52.5,13.45,4
        |sh2,52.5,13.30,1
        |sh2,52.5,13.35,2
        |sh2,52.5,13.40,3
        |sh2,52.5,13.45,4
        |""".stripMargin,
    "transfers.txt" ->
      """from_stop_id,to_stop_id,transfer_type
        |s9dup,s3,0
        |""".stripMargin,
    // upper-case lang code (→ L2 lowering)
    "feed_info.txt" ->
      """feed_publisher_name,feed_publisher_url,feed_lang
        |Metro,https://metro.example,DE
        |""".stripMargin,
    "translations.txt" ->
      """table_name,field_name,language,translation,record_id
        |stops,stop_name,DE,Alexanderplatz Bhf,s2
        |""".stripMargin)

  /** Write the fixture feed as CSVs into `dir`. `mutate` lets tests
    * produce a changed feed (different digest). */
  def writeTo(dir: Path, mutate: Map[String, String] => Map[String, String] = identity): Path = {
    Files.createDirectories(dir)
    mutate(files).foreach { case (name, content) =>
      Files.writeString(dir.resolve(name), content)
    }
    dir
  }
}
