package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The consumer query surface of the reference (SURVEY.md §2.7 V1-V8):
  * the views gtfs-via-postgres generates into each imported DB
  * (/root/reference/import.sh:124-132), re-expressed Spark-first over the
  * driver's test tables. The *real* GTFS implementations live in
  * `graft.gtfs.Views`; these queries demonstrate the same relational
  * shapes with a DuckDB oracle.
  *
  * Scale notes (100 TB target):
  *  - fan-outs (V1/V3/V7) are bounded per row (≤14/≤6/≤5 output rows per
  *    input row), so explode never amplifies a hot key unboundedly;
  *  - the star join (V2) broadcasts only fixed-cardinality dims
  *    (nation=25, region=5); customer/orders/lineitem joins are left to
  *    sort-merge + AQE;
  *  - windows partition by natural keys (user_id, trip analogs) that are
  *    high-cardinality and unskewed — no global sort before the window;
  *  - ordered-collect aggregations only ever see bounded groups
  *    (≤7 lineitems per order) — documented invariant, see V5.
  */
object Views {

  /** V2 star join, shared with SparkEntry.entry (flagship).
    * stop_times ⋈ trips ⋈ routes ⋈ stops analog: lineitem ⋈ orders ⋈
    * customer ⋈ nation ⋈ region with grouped stats.
    * Reference: gtfs-via-postgres arrivals_departures
    * (/root/reference/import.sh:124-132). */
  def v2Entry(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "o_orderstatus")
      .agg(
        count(lit(1)).as("n_lines"),
        sumCents(col("l_extendedprice")).as("revenue_cents"))
  }

  val defs: Map[String, QueryDef] = Map(

    // V1: service_days — expand calendar (weekly mask over a date range)
    // into one row per (service_id, date), union calendar_dates
    // exception_type=1 additions, anti-join exception_type=2 removals.
    // Reference semantics: gtfs-via-postgres service_days materialized
    // view; calendar/calendar_dates loaded at /root/reference/import.sh:124-132.
    "v1_service_days" -> QueryDef(
      doc = "sequence+explode date expansion, weekday mask, union add, anti-join remove",
      oracle = """
        |WITH cal AS (
        |  SELECT o_orderkey AS service_id,
        |         CAST(o_orderdate AS DATE) AS start_date,
        |         o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 < 3
        |), base AS (
        |  SELECT service_id, CAST(d AS DATE) AS svc_date
        |  FROM cal, unnest(generate_series(start_date, start_date + 13, INTERVAL 1 DAY)) AS t(d)
        |  WHERE (service_id + isodow(CAST(d AS DATE))) % 3 <> 0
        |), added AS (
        |  SELECT service_id, start_date + 20 AS svc_date FROM cal
        |  WHERE o_orderpriority LIKE '1-%'
        |), removed AS (
        |  SELECT service_id, start_date + 2 AS svc_date FROM cal
        |  WHERE o_orderpriority LIKE '2-%'
        |)
        |SELECT service_id, strftime(svc_date, '%Y-%m-%d') AS svc_date
        |FROM (SELECT * FROM base UNION ALL SELECT * FROM added) b
        |WHERE NOT EXISTS (SELECT 1 FROM removed r
        |                  WHERE r.service_id = b.service_id AND r.svc_date = b.svc_date)
        |ORDER BY service_id, svc_date
        |""") { (s, d) =>
      val cal = Tables.orders(s, d)
        .where(col("o_orderkey") % 10 < 3)
        .select(col("o_orderkey").as("service_id"),
          col("o_orderdate").cast("date").as("start_date"),
          col("o_orderpriority"))
      val base = cal
        .select(col("service_id"),
          explode(expr("sequence(start_date, date_add(start_date, 13), interval 1 day)"))
            .as("svc_date"))
        // isodow (Mon=1..Sun=7) == Spark weekday (Mon=0..Sun=6) + 1
        .where((col("service_id") + expr("weekday(svc_date)") + 1) % 3 =!= 0)
      val added = cal.where(col("o_orderpriority").startsWith("1-"))
        .select(col("service_id"), date_add(col("start_date"), 20).as("svc_date"))
      val removed = cal.where(col("o_orderpriority").startsWith("2-"))
        .select(col("service_id"), date_add(col("start_date"), 2).as("svc_date"))
      base.unionByName(added)
        .join(removed, Seq("service_id", "svc_date"), "left_anti")
        .select(col("service_id"), date_format(col("svc_date"), "yyyy-MM-dd").as("svc_date"))
    },

    // V2 flagship star join (see v2Entry) with an oracle.
    "v2_entry" -> QueryDef(
      doc = "arrivals_departures star join: fact ⋈ fact ⋈ dim chain + grouped stats",
      oracle = """
        |SELECT r_name, o_orderstatus, count(*) AS n_lines,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, o_orderstatus
        |ORDER BY r_name, o_orderstatus
        |""")(v2Entry),

    // V2 time semantics: GTFS HH:MM:SS with HH >= 24 allowed, absolute
    // event time = service-date noon-minus-12h anchor + seconds.
    // The DST-correct variant (real tz math on Europe/Berlin) is in
    // graft.gtfs.Views + GtfsTimeSpec; with the session pinned to UTC the
    // anchor reduces to midnight, which is what DuckDB can check.
    "v2_gtfs_time" -> QueryDef(
      doc = "GTFS time >24:00:00 parse + noon−12h anchor → absolute epoch",
      oracle = """
        |WITH x AS (
        |  SELECT event_id, ts,
        |         CAST(floor(value * 997) AS BIGINT) % 115200 AS secs
        |  FROM events
        |), g AS (
        |  SELECT event_id, ts,
        |         lpad(CAST(secs // 3600 AS VARCHAR), 2, '0') || ':' ||
        |         lpad(CAST((secs % 3600) // 60 AS VARCHAR), 2, '0') || ':' ||
        |         lpad(CAST(secs % 60 AS VARCHAR), 2, '0') AS gtfs_time
        |  FROM x
        |)
        |SELECT event_id, gtfs_time,
        |       (CAST(floor(epoch(CAST(CAST(ts AS DATE) AS TIMESTAMP))) AS BIGINT) + 43200)
        |         - 43200
        |         + CAST(split_part(gtfs_time, ':', 1) AS BIGINT) * 3600
        |         + CAST(split_part(gtfs_time, ':', 2) AS BIGINT) * 60
        |         + CAST(split_part(gtfs_time, ':', 3) AS BIGINT) AS dep_epoch,
        |       CASE WHEN CAST(split_part(gtfs_time, ':', 1) AS BIGINT) >= 24
        |            THEN 1 ELSE 0 END AS next_day
        |FROM g ORDER BY event_id
        |""") { (s, d) =>
      val x = Tables.events(s, d)
        .select(col("event_id"), col("ts"),
          (floor(col("value") * 997).cast("long") % 115200).as("secs"))
      val g = x.select(col("event_id"), col("ts"),
        concat(
          lpad(expr("secs div 3600").cast("string"), 2, "0"), lit(":"),
          lpad(expr("(secs % 3600) div 60").cast("string"), 2, "0"), lit(":"),
          lpad((col("secs") % 60).cast("string"), 2, "0")).as("gtfs_time"))
      val p = split(col("gtfs_time"), ":")
      val parsed = p.getItem(0).cast("long") * 3600 +
        p.getItem(1).cast("long") * 60 + p.getItem(2).cast("long")
      // noon-minus-12h anchor: epoch(date)+43200 is local noon (UTC
      // session), minus 12h, plus the GTFS seconds.
      val anchorNoon = epochS(col("ts").cast("date").cast("timestamp")) + 43200
      g.select(col("event_id"), col("gtfs_time"),
        (anchorNoon - 43200 + parsed).as("dep_epoch"),
        when(p.getItem(0).cast("long") >= 24, 1).otherwise(0).as("next_day"))
    },

    // V3: frequency expansion — trips in frequencies.txt are replicated
    // every headway_secs within half-open [start_time, end_time).
    // Reference: gtfs-via-postgres frequencies handling (exact_times).
    "v3_frequency_explode" -> QueryDef(
      doc = "half-open [start,end) headway expansion via sequence+explode",
      oracle = """
        |WITH f AS (
        |  SELECT event_id,
        |         CAST(floor(value * 13) AS BIGINT) % 3600 + 25200 AS start_s,
        |         300 + (user_id % 5) * 60 AS headway_s
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT event_id, CAST(d AS BIGINT) AS dep_s
        |FROM f, unnest(generate_series(start_s, start_s + 1800 - 1, headway_s)) AS t(d)
        |ORDER BY event_id, dep_s
        |""") { (s, d) =>
      Tables.events(s, d)
        .where(col("event_type") === "click")
        .select(col("event_id"),
          (floor(col("value") * 13).cast("long") % 3600 + 25200).as("start_s"),
          (lit(300) + (col("user_id") % 5) * 60).as("headway_s"))
        // half-open [start, end): stop at end-1 (sequence is inclusive)
        .select(col("event_id"),
          explode(expr("sequence(start_s, start_s + 1800 - 1, headway_s)")).as("dep_s"))
    },

    // V4: connections — consecutive stop_time pairs per trip become
    // (from_stop, departure) → (to_stop, arrival) edges.
    // Reference: gtfs-via-postgres connections view; lead() over
    // (trip_id, stop_sequence).
    "v4_connections" -> QueryDef(
      doc = "lead window: consecutive event pairs per user as travel edges",
      oracle = """
        |SELECT user_id, from_event, to_event, dep_epoch, arr_epoch
        |FROM (
        |  SELECT user_id, event_id AS from_event,
        |         lead(event_id) OVER w AS to_event,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS dep_epoch,
        |         lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS arr_epoch
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |WHERE to_event IS NOT NULL
        |ORDER BY user_id, dep_epoch, from_event
        |""") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id").as("from_event"),
          lead("event_id", 1).over(w).as("to_event"),
          epochS(col("ts")).as("dep_epoch"),
          lead(epochS(col("ts")), 1).over(w).as("arr_epoch"))
        .where(col("to_event").isNotNull)
    },

    // V5: shapes_aggregated — ordered points per shape folded into one
    // linestring (PostGIS ST_MakeLine(array_agg … ORDER BY seq)).
    // Bounded-group invariant: groups are per-order lineitems (≤7 rows)
    // — like real GTFS shapes (hundreds of points), never fact-scale.
    "v5_shapes_agg" -> QueryDef(
      doc = "ordered collect → linestring digest per shape",
      oracle = """
        |SELECT l_orderkey AS shape_id,
        |       count(*) AS n_points,
        |       substr(sha256(string_agg(
        |         CAST(l_partkey AS VARCHAR) || ',' || CAST(l_suppkey AS VARCHAR),
        |         ';' ORDER BY l_linenumber, l_partkey, l_suppkey)), 1, 6) AS line_digest
        |FROM lineitem
        |GROUP BY l_orderkey
        |ORDER BY shape_id
        |""") { (s, d) =>
      fanout(Tables.lineitem(s, d), col("l_orderkey"))
        .select(col("l_orderkey").as("shape_id"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          concat(col("l_partkey").cast("string"), lit(","),
            col("l_suppkey").cast("string")).as("pt"))
        .groupBy("shape_id")
        .agg(
          count(lit(1)).as("n_points"),
          substring(sha2(
            array_join(transform(
              array_sort(collect_list(struct(col("l_linenumber"), col("l_partkey"),
                col("l_suppkey"), col("pt")))),
              x => x.getField("pt")), ";"), 256), 1, 6).as("line_digest"))
    },

    // V6: stats_by_route_date — arrivals/departures counts grouped by
    // (route, month): count, distinct-trip count, revenue.
    "v6_stats" -> QueryDef(
      doc = "grouped stats: count + count distinct + exact cents sum",
      oracle = """
        |SELECT o_orderpriority AS route_id,
        |       strftime(o_orderdate, '%Y-%m') AS svc_month,
        |       count(*) AS n_events,
        |       count(DISTINCT l_orderkey) AS n_trips,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2
        |ORDER BY route_id, svc_month
        |""") { (s, d) =>
      // pre-aggregate the fact table per join key BEFORE the join: the
      // distinct key (l_orderkey) IS the join key, so countDistinct over
      // the joined rows — whose Expand doubles shuffle width — becomes a
      // plain count over the pre-agg, and the join's probe side shrinks
      // from ~4 rows/order × full width to 1 row/order × 3 columns.
      val perOrder = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_lines"),
          sumCents(col("l_extendedprice")).as("cents"))
      Tables.orders(s, d)
        .join(perOrder, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority").as("route_id"),
          date_format(col("o_orderdate"), "yyyy-MM").as("svc_month"))
        .agg(sum("n_lines").as("n_events"),
          count(lit(1)).as("n_trips"),
          sum("cents").as("revenue_cents"))
    },

    // V7: stats_active_trips_by_hour — trips whose [start, end] interval
    // overlaps each hour bucket; interval-overlap re-expressed as a
    // bounded explode over hour buckets (≤5 per event) + count, avoiding
    // a true inequality join (which would be O(n²) at scale).
    "v7_active_by_hour" -> QueryDef(
      doc = "interval overlap via bounded sequence+explode, groupBy hour",
      oracle = """
        |WITH iv AS (
        |  SELECT event_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS start_s,
        |         CAST(floor(epoch(ts)) AS BIGINT)
        |           + CAST(floor(value * 29) AS BIGINT) % 14400 AS end_s
        |  FROM events
        |)
        |SELECT CAST(h AS BIGINT) AS hour_bucket, count(*) AS n_active
        |FROM iv, unnest(generate_series(start_s // 3600, end_s // 3600, 1)) AS t(h)
        |GROUP BY 1
        |ORDER BY hour_bucket
        |""") { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), epochS(col("ts")).as("start_s"),
          (epochS(col("ts")) + floor(col("value") * 29).cast("long") % 14400).as("end_s"))
        .select(explode(expr("sequence(start_s div 3600, end_s div 3600, 1)")).as("hour_bucket"))
        .groupBy("hour_bucket")
        .agg(count(lit(1)).as("n_active"))
    },

    // V8: translations — generic lookup join on
    // (table_name, field_name, record_id, language), lang codes
    // lower-cased per L2 (--lower-case-lang-codes,
    // /root/reference/import.sh:125). The lookup is bounded (≤25 rows
    // here; translations are dimension-scale) → broadcast.
    "v8_translations" -> QueryDef(
      doc = "broadcast lookup join + lower-cased lang codes",
      oracle = """
        |WITH tr AS (
        |  SELECT n_nationkey AS record_id,
        |         lower(CASE n_nationkey % 3 WHEN 0 THEN 'DE' WHEN 1 THEN 'FR' ELSE 'EN' END) AS language,
        |         lower(n_name) AS translation
        |  FROM nation
        |)
        |SELECT language, translation, count(*) AS n_customers
        |FROM customer JOIN tr ON c_nationkey = record_id
        |GROUP BY language, translation
        |ORDER BY language, translation
        |""") { (s, d) =>
      val tr = Tables.nation(s, d)
        .select(col("n_nationkey").as("record_id"),
          lower(when(col("n_nationkey") % 3 === 0, "DE")
            .when(col("n_nationkey") % 3 === 1, "FR")
            .otherwise("EN")).as("language"),
          lower(col("n_name")).as("translation"))
      Tables.customer(s, d)
        .join(broadcast(tr), col("c_nationkey") === col("record_id"))
        .groupBy("language", "translation")
        .agg(count(lit(1)).as("n_customers"))
    },

    // V8b: the GENERIC translations matrix — runs the REAL
    // gtfs.Views.translateField over a GTFS-shaped feed synthesized
    // from nation/region, exercising all three spec resolution paths
    // at once: record_id rows (nationkey%2=0), field_value rows
    // (nationkey%4=0 — a strict subset, so id-over-value precedence is
    // observable in the output: *_id, never *_val), and untranslated
    // records (odd keys → language NULL, original as fallback). Two
    // entities (routes.route_long_name + trips.trip_headsign) prove the
    // join is not stops-specific. Lang codes arrive upper-case and must
    // come out lower (L2).
    "v8b_translations_generic" -> QueryDef(
      doc = "generic (table,field) translations: record_id/field_value resolution, id precedence, NULL-language fallback, two entities",
      oracle = """
        |WITH routes AS (
        |  SELECT CAST(n_nationkey AS VARCHAR) AS route_id, n_name AS route_long_name FROM nation
        |), trips AS (
        |  SELECT CAST(r_regionkey AS VARCHAR) AS trip_id, r_name AS trip_headsign FROM region
        |), tr AS (
        |  SELECT 'routes' AS table_name, 'route_long_name' AS field_name,
        |         lower(CASE n_nationkey % 3 WHEN 0 THEN 'DE' WHEN 1 THEN 'FR' ELSE 'EN' END) AS language,
        |         lower(n_name) || '_id' AS translation,
        |         CAST(n_nationkey AS VARCHAR) AS record_id, CAST(NULL AS VARCHAR) AS field_value, 1 AS prio
        |  FROM nation WHERE n_nationkey % 2 = 0
        |  UNION ALL
        |  SELECT 'routes', 'route_long_name',
        |         lower(CASE n_nationkey % 3 WHEN 0 THEN 'DE' WHEN 1 THEN 'FR' ELSE 'EN' END),
        |         lower(n_name) || '_val', NULL, n_name, 2
        |  FROM nation WHERE n_nationkey % 4 = 0
        |  UNION ALL
        |  SELECT 'trips', 'trip_headsign', 'en', lower(r_name) || '_hd', NULL, r_name, 2 FROM region
        |), matches AS (
        |  SELECT 'routes' AS entity, r.route_id AS record_key, t.language,
        |         r.route_long_name AS original, t.translation, t.prio
        |  FROM routes r JOIN tr t
        |    ON t.table_name = 'routes' AND t.field_name = 'route_long_name'
        |   AND ((t.record_id IS NOT NULL AND t.record_id = r.route_id)
        |     OR (t.record_id IS NULL AND t.field_value = r.route_long_name))
        |  UNION ALL
        |  SELECT 'trips', tp.trip_id, t.language, tp.trip_headsign, t.translation, t.prio
        |  FROM trips tp JOIN tr t
        |    ON t.table_name = 'trips' AND t.field_name = 'trip_headsign'
        |   AND ((t.record_id IS NOT NULL AND t.record_id = tp.trip_id)
        |     OR (t.record_id IS NULL AND t.field_value = tp.trip_headsign))
        |), resolved AS (
        |  SELECT entity, record_key, language, original,
        |         arg_min(translation, prio) AS translation
        |  FROM matches GROUP BY entity, record_key, language, original
        |), all_entities AS (
        |  SELECT 'routes' AS entity, route_id AS record_key, route_long_name AS original FROM routes
        |  UNION ALL
        |  SELECT 'trips', trip_id, trip_headsign FROM trips
        |)
        |SELECT e.entity, e.record_key, r.language, e.original,
        |       coalesce(r.translation, e.original) AS translated
        |FROM all_entities e LEFT JOIN resolved r
        |  ON e.entity = r.entity AND e.record_key = r.record_key
        |ORDER BY e.entity, e.record_key, r.language
        |""") { (s, d) =>
      val nation = Tables.nation(s, d)
      val region = Tables.region(s, d)
      val routes = nation.select(
        col("n_nationkey").cast("string").as("route_id"),
        col("n_name").as("route_long_name"))
      val trips = region.select(
        col("r_regionkey").cast("string").as("trip_id"),
        col("r_name").as("trip_headsign"))
      val lang = when(col("n_nationkey") % 3 === 0, "DE")
        .when(col("n_nationkey") % 3 === 1, "FR").otherwise("EN")
      val nullS = lit(null).cast("string")
      val trId = nation.where(col("n_nationkey") % 2 === 0).select(
        lit("routes").as("table_name"), lit("route_long_name").as("field_name"),
        lang.as("language"),
        concat(lower(col("n_name")), lit("_id")).as("translation"),
        col("n_nationkey").cast("string").as("record_id"),
        nullS.as("record_sub_id"), nullS.as("field_value"))
      val trVal = nation.where(col("n_nationkey") % 4 === 0).select(
        lit("routes").as("table_name"), lit("route_long_name").as("field_name"),
        lang.as("language"),
        concat(lower(col("n_name")), lit("_val")).as("translation"),
        nullS.as("record_id"), nullS.as("record_sub_id"),
        col("n_name").as("field_value"))
      val trTrip = region.select(
        lit("trips").as("table_name"), lit("trip_headsign").as("field_name"),
        lit("EN").as("language"),
        concat(lower(col("r_name")), lit("_hd")).as("translation"),
        nullS.as("record_id"), nullS.as("record_sub_id"),
        col("r_name").as("field_value"))
      val feed: graft.gtfs.Clean.Feed = Map(
        "routes" -> routes, "trips" -> trips,
        "translations" -> trId.unionByName(trVal).unionByName(trTrip))
      val r = graft.gtfs.Views.translateField(feed, "routes", "route_long_name")
        .select(lit("routes").as("entity"), col("record_key"), col("language"),
          col("route_long_name").as("original"),
          col("route_long_name_translated").as("translated"))
      val t = graft.gtfs.Views.translateField(feed, "trips", "trip_headsign")
        .select(lit("trips").as("entity"), col("record_key"), col("language"),
          col("trip_headsign").as("original"),
          col("trip_headsign_translated").as("translated"))
      r.unionByName(t)
    },
  )
}
