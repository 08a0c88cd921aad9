package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Event-stream analytics over the `events` table — the time-series
  * join surface (see [[graft.ops.AsOf]]).
  */
object Events {

  val defs: Map[String, QueryDef] = Map(

    // Backward as-of join: each click event attached to the same
    // user's most recent prior-or-equal view event — the
    // event-against-latest-state lookup (session attribution, price
    // as-of trade, latest-sensor-reading joins). Oracle: DuckDB's
    // native ASOF LEFT JOIN. Both engines compare epoch-MICROSECOND
    // integers: events.parquet is TIMESTAMP(NANOS), which
    // Tables.events floor-truncates to µs, so the oracle truncates
    // identically (epoch_ns // 1000) — comparing raw timestamps would
    // let a sub-µs difference order the engines differently. The right
    // side pre-aggregates to one row per (user_id, µs): AsOf resolves
    // equal-(key, ts) right rows by sort order, which is not
    // deterministic across engines, so the query removes the ambiguity
    // (max event_id per µs) rather than depending on either engine's
    // tie-break.
    "q7_asof_events" -> QueryDef(
      doc = "backward as-of join: click → latest prior view per user",
      oracle = """
        |WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS uts
        |  FROM events
        |), l AS (
        |  SELECT event_id, user_id, uts FROM e WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id, uts AS rts, max(event_id) AS view_id
        |  FROM e WHERE event_type = 'view' GROUP BY 1, 2
        |)
        |SELECT l.event_id, l.user_id, r.view_id
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.uts >= r.rts
        |ORDER BY l.event_id
        |""") { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("uts"))
      val clicks = e.where(col("event_type") === "click")
        .select("event_id", "user_id", "uts")
      val views = e.where(col("event_type") === "view")
        .groupBy(col("user_id"), col("uts").as("rts"))
        .agg(max("event_id").as("view_id"))
      graft.ops.AsOf.backward(clicks, views, keys = Seq("user_id"),
        leftTs = "uts", rightTs = "rts")
        .select("event_id", "user_id", "view_id")
    },
  )
}
