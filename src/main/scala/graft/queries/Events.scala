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
    // integers: Tables.events normalizes ts to a µs TIMESTAMP whatever
    // the parquet encoding (nanos-as-long or timestamp[us]), and the
    // oracle truncates identically (epoch_ns // 1000) — comparing raw
    // timestamps would let a sub-µs difference order the engines
    // differently. The right
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

    // Point-in-interval (range) join: for each order date, how many
    // lineitems were in their delivery window (ship day, half-open
    // span of l_quantity days) — in-transit inventory by day, the
    // interval-overlap aggregation. Spark has no inequality join
    // operator (naive form = BroadcastNestedLoopJoin, broadcast-only);
    // ops.Ranges buckets the day domain at 7 days (~median span of the
    // 1-50-day windows) so the pairing is an EQUI join Catalyst can
    // shuffle/broadcast/AQE-split as usual. Both engines work in
    // epoch-DAY integers (timestamps are UTC midnights; floor(epoch/
    // 86400) and `CAST AS LONG div 86400` agree on positive epochs),
    // and quantities are integral doubles, so the cast is exact.
    "q8_range_in_transit" -> QueryDef(
      doc = "range join: in-transit lineitem count per order date",
      oracle = """
        |WITH li AS (
        |  SELECT CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT) AS s_day,
        |         CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT)
        |           + CAST(l_quantity AS BIGINT) AS e_day
        |  FROM lineitem
        |), d AS (
        |  SELECT DISTINCT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
        |    AS p_day
        |  FROM orders
        |)
        |SELECT d.p_day AS day, count(*) AS n_transit
        |FROM d JOIN li ON li.s_day <= d.p_day AND d.p_day < li.e_day
        |GROUP BY 1 ORDER BY 1
        |""") { (s, d) =>
      val li = Tables.lineitem(s, d).select(
        (epochS(col("l_shipdate")) / 86400).cast("long").as("s_day"),
        ((epochS(col("l_shipdate")) / 86400).cast("long")
          + col("l_quantity").cast("long")).as("e_day"))
      val days = Tables.orders(s, d)
        .select((epochS(col("o_orderdate")) / 86400).cast("long").as("p_day"))
        .distinct()
      graft.ops.Ranges.pointInInterval(days, "p_day", li, "s_day", "e_day",
          bucketWidth = 7L)
        .groupBy(col("p_day").as("day"))
        .agg(count(lit(1)).as("n_transit"))
    },

    // Interval-overlap COUNT: per part, how many pairs of its lineitems
    // had overlapping delivery windows (contention for the same stock).
    // The oracle keeps the self-join formulation (a.lid < b.lid halves
    // the symmetric pair space; lid = l_orderkey*10 + l_linenumber is
    // collision-free, linenumber ≤ 7); the Spark side computes the SAME
    // count without ever materializing a pair.
    "q9_overlap_same_part" -> QueryDef(
      doc = "interval-overlap join: same-part lineitem delivery-window pairs",
      oracle = """
        |WITH li AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS lid, l_partkey AS pk,
        |         CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT) AS s,
        |         CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT)
        |           + CAST(l_quantity AS BIGINT) AS e
        |  FROM lineitem
        |)
        |SELECT a.pk AS l_partkey, count(*) AS n_pairs
        |FROM li a JOIN li b
        |  ON a.pk = b.pk AND a.lid < b.lid AND a.s < b.e AND b.s < a.e
        |GROUP BY 1 ORDER BY 1
        |""") { (s, d) =>
      // Sweep-line pair count (r17 VERDICT "Next" #1): the bucketized
      // self-join (ops.Ranges.intervalSelfOverlap, retained for
      // pair-OUTPUT consumers) is nested-loop-free but its output is
      // O(pairs) — at sf1 ~29 M pair rows flowed into this count, the
      // suite's worst persistent ratio (2.9–10.4× DuckDB's IEJoin
      // across windows). A pair COUNT never needs the pairs:
      // intervalOverlapCount unions start/end events per part and runs
      // TWO running sums over ONE (pk, event) window — one exchange of
      // 2 rows per lineitem, zero fan-out, no bucket-width knob. The
      // a.lid < b.lid predicate in the oracle is exactly
      // each-unordered-pair-once, which the sweep counts inherently;
      // parts whose lineitems never overlap produce no oracle row, so
      // the 0-count rows are filtered.
      val side = Tables.lineitem(s, d).select(
        col("l_partkey").as("pk"),
        (epochS(col("l_shipdate")) / 86400).cast("long").as("s"),
        ((epochS(col("l_shipdate")) / 86400).cast("long")
          + col("l_quantity").cast("long")).as("e"))
      graft.ops.Ranges.intervalOverlapCount(side, Seq("pk"), "s", "e")
        .where(col("n_pairs") > 0)
        .select(col("pk").as("l_partkey"), col("n_pairs"))
    },

    // Batch sessionization (gaps-and-islands): split each user's event
    // stream at >30-minute silences, emit per-session stats — the
    // batch counterpart of streaming/Streams.sessionize's
    // mapGroupsWithState. Two windows over the SAME (user_id, ts)
    // partitioning — lag to mark gap starts, running sum to number
    // sessions — so Catalyst plans ONE exchange + one sort for the
    // pair; per-user state is the window frame, never the corpus. Both
    // engines work in epoch-second integers (events ts is ns-precision;
    // µs-truncation then second-floor agree).
    "q10_sessionize" -> QueryDef(
      doc = "gaps-and-islands sessionization: 30-min gap rule per user",
      oracle = """
        |WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000000000 AS sec
        |  FROM events
        |), marked AS (
        |  SELECT user_id, sec,
        |         CASE WHEN sec - lag(sec) OVER w > 1800 OR
        |                   lag(sec) OVER w IS NULL
        |              THEN 1 ELSE 0 END AS is_start
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)
        |), numbered AS (
        |  SELECT user_id, sec,
        |         sum(is_start) OVER (PARTITION BY user_id ORDER BY sec
        |                             ROWS UNBOUNDED PRECEDING) AS session_no
        |  FROM marked
        |)
        |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |       count(*) AS n_events,
        |       min(sec) AS start_sec, max(sec) - min(sec) AS dur_sec
        |FROM numbered GROUP BY 1, 2
        |ORDER BY 1, 2
        |""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("sec")
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"),
          (unix_micros(col("ts")) / 1000000).cast("long").as("sec"))
        .withColumn("is_start",
          when(col("sec") - lag("sec", 1).over(byUser) > 1800 ||
            lag("sec", 1).over(byUser).isNull, 1).otherwise(0))
        .withColumn("session_no", sum("is_start").over(run).cast("long"))
        .groupBy("user_id", "session_no")
        .agg(count(lit(1)).as("n_events"),
          min("sec").as("start_sec"),
          (max("sec") - min("sec")).as("dur_sec"))
    },

    // Funnel analysis (view → click → purchase, strictly ordered): the
    // sequential-conversion query behind every product dashboard. Each
    // stage is "earliest qualifying event strictly after the previous
    // stage", computed as a conditional-min aggregation chained through
    // an equi join back to the event stream — every agg and every join
    // keys on user_id, so the whole funnel is ONE partitioning: the
    // first exchange establishes it and AQE reuses/aligns the rest. No
    // per-user event list is ever collected (contrast a
    // sort_array(collect_list) scan: per-key state bounded only by
    // user activity); stage state is one timestamp per user per stage.
    // Missing stages surface as -1 (engine-neutral; NULL ordering
    // differs across engines in the compare).
    "q17_funnel" -> QueryDef(
      doc = "3-stage strict-order funnel, 24h conversion windows, chained min-aggs",
      oracle = """
        |WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS uts FROM events
        |), s1 AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'view' THEN uts END) AS t1
        |  FROM e GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, min(uts) AS t2
        |  FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click'
        |    AND uts > t1 AND uts <= t1 + 86400000000 GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id, min(uts) AS t3
        |  FROM e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase'
        |    AND uts > t2 AND uts <= t2 + 86400000000 GROUP BY 1
        |)
        |SELECT s1.user_id,
        |       coalesce(t1, -1) AS view_us,
        |       coalesce(t2, -1) AS click_us,
        |       coalesce(t3, -1) AS purchase_us,
        |       CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY 1
        |""") { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("uts"))
      val s1 = e.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("uts"))).as("t1"))
      val dayUs = 86400000000L // 24 h conversion window per stage
      val s2 = e.join(s1, Seq("user_id"))
        .where(col("event_type") === "click" &&
          col("uts") > col("t1") && col("uts") <= col("t1") + dayUs)
        .groupBy("user_id").agg(min("uts").as("t2"))
      val s3 = e.join(s2, Seq("user_id"))
        .where(col("event_type") === "purchase" &&
          col("uts") > col("t2") && col("uts") <= col("t2") + dayUs)
        .groupBy("user_id").agg(min("uts").as("t3"))
      s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
        .select(col("user_id"),
          coalesce(col("t1"), lit(-1L)).as("view_us"),
          coalesce(col("t2"), lit(-1L)).as("click_us"),
          coalesce(col("t3"), lit(-1L)).as("purchase_us"),
          when(col("t3").isNotNull, 3L).when(col("t2").isNotNull, 2L)
            .when(col("t1").isNotNull, 1L).otherwise(0L).as("stage"))
    },

    // Weekly retention cohort matrix: users grouped by their first
    // purchase week, counted in each later week they purchased again —
    // the classic product-analytics triangle. Shape: ONE corpus-scale
    // aggregation (distinct (user, week), keyed shuffle with map-side
    // combine), then a window keyed on user_id over the already
    // per-user-week frame (weeks-per-user rows, bounded by calendar ≪
    // events-per-user), then a final aggregation over the tiny
    // (cohort, offset) space. Both engines truncate weeks to the ISO
    // Monday, so cohort labels agree; offsets are integer day
    // arithmetic — no float at the bucket boundary.
    "q20_retention_cohorts" -> QueryDef(
      doc = "weekly purchase retention cohorts (first-week x offset)",
      oracle = """
        |WITH uw AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |), c AS (
        |  SELECT user_id, wk, min(wk) OVER (PARTITION BY user_id) AS cohort
        |  FROM uw
        |)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
        |       CAST((wk - cohort) // 7 AS BIGINT) AS offset_wk,
        |       count(*) AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2
        |""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val uw = Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .agg(count(lit(1)).as("n_ev"))
      val c = uw.withColumn("cohort",
        min("wk").over(Window.partitionBy("user_id")))
      c.groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
          expr("datediff(wk, cohort) div 7").as("offset_wk"))
        .agg(count(lit(1)).as("n_users"))
    },

    // Time-series gap fill + forward fill: resample each event type to
    // an hourly grid spanning its own [min, max] hour, left-join the
    // actual hourly aggregates, and carry the last observed sum across
    // empty hours (sensor/metric densification). The grid is generated
    // from the 1-row-per-type span aggregate — sequence() explodes
    // per TYPE, so grid size is bounded by (types × hours of history),
    // never by event volume; the forward-fill window partitions on
    // event_type and is as parallel as the type cardinality. Both
    // engines sum exact integer cents and run IGNORE NULLS last_value
    // over the same frame.
    "q21_gap_fill" -> QueryDef(
      doc = "hourly resample + forward-fill per event type",
      oracle = """
        |WITH e AS (
        |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr, value
        |  FROM events
        |), agg AS (
        |  SELECT event_type, hr, count(*) AS n,
        |         sum(CAST(round(value * 100) AS BIGINT)) AS v_cents
        |  FROM e GROUP BY 1, 2
        |), span AS (
        |  SELECT event_type, min(hr) AS h0, max(hr) AS h1 FROM agg GROUP BY 1
        |), grid AS (
        |  SELECT event_type, h AS hr
        |  FROM span, unnest(generate_series(h0, h1)) AS t(h)
        |), j AS (
        |  SELECT g.event_type, g.hr, a.n, a.v_cents
        |  FROM grid g LEFT JOIN agg a ON g.event_type = a.event_type AND g.hr = a.hr
        |)
        |SELECT event_type, hr,
        |       CAST(coalesce(n, 0) AS BIGINT) AS n_events,
        |       CAST(coalesce(last_value(v_cents IGNORE NULLS) OVER (
        |         PARTITION BY event_type ORDER BY hr
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT)
        |         AS v_cents_filled,
        |       CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
        |FROM j ORDER BY event_type, hr
        |""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val agg = Tables.events(s, d)
        // µs div 3.6e9 == ns div 3.6e12 for positive epochs (Tables
        // .events already normalizes ts to a µs TIMESTAMP)
        .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"),
          col("value"))
        .groupBy("event_type", "hr")
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("v_cents"))
      val grid = agg.groupBy("event_type")
        .agg(min("hr").as("h0"), max("hr").as("h1"))
        .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hr"))
      val w = Window.partitionBy("event_type").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(agg, Seq("event_type", "hr"), "left")
        .select(col("event_type"), col("hr"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          coalesce(last(col("v_cents"), ignoreNulls = true).over(w), lit(0L))
            .as("v_cents_filled"),
          when(col("n").isNull, 1L).otherwise(0L).as("is_gap"))
    },
  )
}
