package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the warehouse-maintenance family on sf0.001 (the
  * DuckDB oracle checks exact values at sf0.01; these pin the algebraic
  * properties a hash-compare can't express: rollup level arithmetic,
  * merge case partitioning, interval contiguity). */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q11_rollup: levels are consistent aggregates of each other") {
    val rows = Warehouse.defs("q11_rollup").fn(spark, sf)
      .select("rflag", "lstatus", "gid", "n", "revenue_cents")
      .as[(String, String, Long, Long, Long)].collect()
    val leaf = rows.filter(_._3 == 0)
    val perFlag = rows.filter(_._3 == 1)
    val grand = rows.filter(_._3 == 3)
    assert(grand.length == 1)
    assert(grand.head._4 == leaf.map(_._4).sum)
    assert(grand.head._5 == leaf.map(_._5).sum)
    perFlag.foreach { case (f, all, _, n, cents) =>
      assert(all == "ALL")
      assert(n == leaf.filter(_._1 == f).map(_._4).sum)
      assert(cents == leaf.filter(_._1 == f).map(_._5).sum)
    }
    // rolled-up rows only at the declared levels (ROLLUP, not CUBE)
    assert(rows.map(_._3).toSet == Set(0L, 1L, 3L))
  }

  test("q12_pivot: cells partition the orders table") {
    val df = Warehouse.defs("q12_pivot").fn(spark, sf)
    val total = df.select((col("f_n") + col("o_n") + col("p_n")).as("n"))
      .agg(sum("n")).as[Long].head()
    assert(total == graft.Tables.orders(spark, sf).count())
  }

  test("q13_cdc_merge: op cases partition keys; deletes drop; LWW wins") {
    val merged = Warehouse.defs("q13_cdc_merge").fn(spark, sf)
      .select("c_custkey", "acctbal_cents", "op")
      .as[(Long, Long, String)].collect()
    assert(merged.map(_._1).distinct.length == merged.length) // keyed result

    val custKeys = graft.Tables.customer(spark, sf)
      .select("c_custkey").as[Long].collect().toSet
    // brute-force last-writer-wins change feed
    val lastByUser = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("uts"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, String, Long, Long)].collect()
      .groupBy(_._1).map { case (u, evs) =>
        val last = evs.maxBy(e => (e._4, e._2))
        (u + 1400, last._3, last._5)
      }
    val byOp = merged.groupBy(_._3)
    byOp.getOrElse("keep", Array.empty).foreach { case (k, _, _) =>
      assert(custKeys.contains(k) && !lastByUser.exists(_._1 == k))
    }
    byOp.getOrElse("update", Array.empty).foreach { case (k, cents, _) =>
      val ch = lastByUser.find(_._1 == k).get
      assert(custKeys.contains(k) && ch._2 != "error" && cents == ch._3)
    }
    byOp.getOrElse("insert", Array.empty).foreach { case (k, cents, _) =>
      val ch = lastByUser.find(_._1 == k).get
      assert(!custKeys.contains(k) && ch._2 != "error" && cents == ch._3)
    }
    // deleted = matched keys whose last change is 'error'; absent from result
    lastByUser.filter(_._2 == "error").foreach { case (k, _, _) =>
      assert(!merged.exists(_._1 == k))
    }
    // completeness: every key is accounted for exactly once
    val expectedKeys = custKeys.filterNot(k =>
      lastByUser.exists(c => c._1 == k && c._2 == "error")) ++
      lastByUser.filter(c => !custKeys.contains(c._1) && c._2 != "error").map(_._1)
    assert(merged.map(_._1).toSet == expectedKeys)
  }

  test("q14_scd2: versions dense, intervals contiguous, last open-ended") {
    val rows = Warehouse.defs("q14_scd2").fn(spark, sf)
      .select("user_id", "version", "valid_from_us", "valid_to_us")
      .as[(Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, hist0) =>
      val hist = hist0.sortBy(_._2)
      assert(hist.map(_._2).toSeq == (1L to hist.length).toSeq)
      hist.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3) // half-open contiguity
        case _ =>
      }
      assert(hist.last._4 == Long.MaxValue)
      hist.init.foreach(h => assert(h._3 < h._4))
    }
  }

  test("pagerank3: hand-checkable graphs — symmetric pair is stationary, star skews to hub") {
    // symmetric 2-node graph: both degrees 1, uniform start is the
    // stationary point — every iteration returns exactly 1_000_000 ppm
    val pair = Seq(("a", "b")).toDF("src", "dst")
    val prPair = Warehouse.pagerank3(pair)
      .as[(String, Long)].collect().toMap
    graft.ops.Releases.drain()
    assert(prPair == Map("a" -> 1000000L, "b" -> 1000000L), s"$prPair")
    // 3-leaf star: the hub accumulates 3 whole leaf ranks each round
    // while each leaf gets hub/3 — hub rank must exceed leaf rank, and
    // the three leaves are symmetric (identical ranks)
    val star = Seq(("hub", "l1"), ("hub", "l2"), ("hub", "l3"))
      .toDF("src", "dst")
    val prStar = Warehouse.pagerank3(star)
      .as[(String, Long)].collect().toMap
    graft.ops.Releases.drain()
    assert(prStar("hub") > prStar("l1"), s"$prStar")
    assert(prStar("l1") == prStar("l2") && prStar("l2") == prStar("l3"))
    // integer recurrence is exactly reproducible: hand-run the same
    // 3 rounds (deg: hub=3, leaves=1; all start at 1e6 ppm)
    var hub = 1000000L; var leaf = 1000000L
    for (_ <- 1 to 3) {
      val nh = 150000L + (85L * (3L * leaf)) / 100L
      val nl = 150000L + (85L * (hub / 3L)) / 100L
      hub = nh; leaf = nl
    }
    assert(prStar("hub") == hub && prStar("l1") == leaf,
      s"expected hub=$hub leaf=$leaf, got $prStar")
  }

  test("q24 triangle enumeration: K4 yields 3 triangles per node, path graphs none") {
    // mirror the query's pipeline from a hand-built undirected edge
    // list (pa < pb): K4 has C(4,3)=4 triangles, each node in exactly
    // 3; a 4-path has none
    def triangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val e = Warehouse.orientByDegree(edges.toDF("pa", "pb"))
      Warehouse.trianglesOriented(e)
        .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
    }
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(triangles(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(triangles(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
  }

  test("q24 orientation: degree orientation collapses the star-hub wedge blowup") {
    // star with the hub id in the MIDDLE of the leaf ids: under the id
    // orientation half the edges enter the hub and half leave it, so
    // the wedge join fans out 50×50 = 2500 rows through the hub. Under
    // the by-degree orientation every edge points leaf→hub (leaf degree
    // 1 < hub degree 100), the hub has out-degree 0, and the wedge set
    // is EMPTY — O(deg²) collapsed to 0 (O(n) in general). Triangle
    // counts are orientation-invariant (a star has none).
    val hub = 50L
    val und = (0L to 100L).filter(_ != hub)
      .map(l => if (l < hub) (l, hub) else (hub, l)).toDF("pa", "pb")
    val idOriented = und.select(col("pa").as("src"), col("pb").as("dst"))
    assert(Warehouse.wedgesOriented(idOriented).count() == 2500L)
    val degOriented = Warehouse.orientByDegree(und)
    assert(Warehouse.wedgesOriented(degOriented).count() == 0L)
    assert(Warehouse.trianglesOriented(degOriented).count() == 0L)
    // orientation is a permutation of the edge set: every undirected
    // edge survives exactly once
    assert(degOriented.count() == 100L)
    // and on a graph WITH triangles the per-node counts are unchanged
    // by the orientation choice: K4 plus a pendant leaf (degrees 3,3,3,4,1)
    val k4p = ((for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)) :+ (4L, 5L))
      .toDF("pa", "pb")
    val byId = Warehouse.trianglesOriented(
      k4p.select(col("pa").as("src"), col("pb").as("dst")))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").count().as[(Long, Long)].collect().toMap
    val byDeg = Warehouse.trianglesOriented(Warehouse.orientByDegree(k4p))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").count().as[(Long, Long)].collect().toMap
    assert(byId == byDeg && byDeg == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }
}
