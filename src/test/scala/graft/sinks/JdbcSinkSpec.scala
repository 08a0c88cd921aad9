package graft.sinks

import graft.SparkSpec
import JdbcSink.JdbcTarget

/** K1 bulk load exercised end-to-end against embedded Derby (the JDBC
  * engine shipped with Spark) — write a feed entity, read it back. */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val target = JdbcTarget(url, loadParallelism = 2)

  test("writeTable + readTable round-trip (fresh-db overwrite semantics)") {
    val stops = Seq(("s1", "A", 52.5, 13.4), ("s2", "B", 52.6, 13.5))
      .toDF("stop_id", "stop_name", "stop_lat", "stop_lon")
    JdbcSink.writeTable(stops, target, "stops")
    val back = JdbcSink.readTable(spark, target, "stops")
    assert(back.count() == 2)
    assert(back.select("stop_id").as[String].collect().toSet == Set("s1", "s2"))
    // overwrite = fresh creation (per-import DB), not append
    JdbcSink.writeTable(stops.limit(1), target, "stops")
    assert(JdbcSink.readTable(spark, target, "stops").count() == 1)
  }

  test("loadFeed writes every entity") {
    val feed = Map(
      "routes" -> Seq(("r1", 1)).toDF("route_id", "route_type"),
      "trips" -> Seq(("t1", "r1"), ("t2", "r1")).toDF("trip_id", "route_id"))
    JdbcSink.loadFeed(feed, target)
    assert(JdbcSink.readTable(spark, target, "routes").count() == 1)
    assert(JdbcSink.readTable(spark, target, "trips").count() == 2)
  }

  test("K5 DDL runs on a separate connection") {
    JdbcSink.executeDdl(url, "CREATE TABLE bookkeeping(db_name VARCHAR(64))")
    JdbcSink.executeDdl(url, "DROP TABLE bookkeeping")
  }

  test("dropSchema does not wildcard-match other schemas through '_'") {
    // '_' is a single-char wildcard in JDBC metadata patterns; the
    // victim schema name differs from the import schema only at the
    // '_' positions, so an unescaped pattern would enumerate (and drop)
    // its tables — the data-loss case the escape exists for
    val imp = Seq(("x", 1)).toDF("a", "b")
    JdbcSink.loadFeedIntoSchema(Map("t" -> imp), target, "gtfs_1_ab")
    JdbcSink.loadFeedIntoSchema(Map("t" -> imp), target, "gtfsX1Xab")
    JdbcSink.dropSchema(target, "gtfs_1_ab")
    // the look-alike schema survives with its table intact
    assert(JdbcSink.readTable(spark, target, "gtfsX1Xab.t").count() == 1)
    // the dropped schema's table is gone
    intercept[Exception] {
      JdbcSink.readTable(spark, target, "gtfs_1_ab.t").count()
    }
  }

  test("dropSchema reaps a schema that never received tables") {
    JdbcSink.executeDdl(target, """CREATE SCHEMA "empty_import"""")
    JdbcSink.dropSchema(target, "empty_import")
    // re-creating proves the DROP happened (Derby errors on duplicates)
    JdbcSink.executeDdl(target, """CREATE SCHEMA "empty_import"""")
    JdbcSink.dropSchema(target, "empty_import")
  }
}
