package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Geo operators: the KNN path behind get_stops_by_distance (L3/L6,
  * SURVEY.md §2.8 "nested-loop/cross + top-k") and the C7
  * Douglas-Peucker simplification, demonstrated over testdata.
  *
  * Scale: KNN never materializes a cross product — a bounding-box
  * prefilter (the grid/GiST-index analog) prunes the scan, then exact
  * distance + top-k. Distance for the ORACLE-CHECKED query is squared
  * Euclidean in degree space (IEEE +,*,- only — bit-identical across
  * engines); the haversine variant (libm trig differs across engines in
  * final ulps) is covered by GeoSpec unit tests instead. */
object GeoOps {

  val defs: Map[String, QueryDef] = Map(

    // Q6/L3: K nearest "stops" to a query point with bbox prune + exact
    // re-rank. Stops synthesized deterministically from customer keys.
    "q6_knn_stops" -> QueryDef(
      doc = "KNN: bounding-box prefilter + exact distance top-k",
      oracle = """
        |WITH stops AS (
        |  SELECT c_custkey AS stop_id,
        |         (c_custkey % 1800) / 10.0 - 90.0 AS lat,
        |         (c_custkey % 3600) / 10.0 - 180.0 AS lon
        |  FROM customer
        |)
        |SELECT stop_id,
        |       CAST(floor(((lat - 50.0) * (lat - 50.0)
        |                 + (lon - 10.0) * (lon - 10.0)) * 1000000) AS BIGINT)
        |         AS dist2_scaled
        |FROM stops
        |WHERE lat BETWEEN 45.0 AND 55.0 AND lon BETWEEN 5.0 AND 15.0
        |ORDER BY dist2_scaled, stop_id
        |LIMIT 10
        |""") { (s, d) =>
      val stops = Tables.customer(s, d)
        .select(col("c_custkey").as("stop_id"),
          ((col("c_custkey") % 1800) / 10.0 - 90.0).as("lat"),
          ((col("c_custkey") % 3600) / 10.0 - 180.0).as("lon"))
      stops
        .where(col("lat").between(45.0, 55.0) && col("lon").between(5.0, 15.0))
        .select(col("stop_id"),
          floor(((col("lat") - 50.0) * (col("lat") - 50.0) +
            (col("lon") - 10.0) * (col("lon") - 10.0)) * 1000000)
            .cast("long").as("dist2_scaled"))
        .orderBy("dist2_scaled", "stop_id")
        .limit(10)
    },

    // IVF ANN with a COMPUTED coarse quantizer (graft.ops.Ivf): build
    // the index (deterministic seeds + Lloyd step), probe 2 cells per
    // query, exact re-rank. Rows-only (the quantizer is iterative —
    // not SQL-expressible); recall vs brute force is asserted in
    // IvfSpec.
    "llm_ann_ivf_centroids" -> QueryDef.noOracle(
      doc = "IVF ANN: computed centroids, nprobe equi-join, exact re-rank") { (s, d) =>
      val e = Tables.embeddings(s, d)
      val (assign, centroids) = graft.ops.Ivf.build(e, k = 8)
      graft.ops.Ivf.search(s, e, assign, centroids,
        e.where(col("vec_id") < 8), k = 10, nprobe = 2)
    },

    // C7 --min-shapes distributed: Douglas-Peucker per shape via
    // flatMapGroups (bounded per-shape groups). Polylines synthesized
    // from lineitem; rows-only check (recursive DP is not
    // SQL-expressible in DuckDB).
    "c7_min_shapes" -> QueryDef.noOracle(
      doc = "Douglas-Peucker polyline simplification per shape group") { (s, d) =>
      import s.implicits._
      import graft.gtfs.Geo
      fanout(Tables.lineitem(s, d), col("l_orderkey"))
        .select(col("l_orderkey").as("shape_id"), col("l_linenumber").as("seq"),
          ((col("l_partkey") % 100) / 10.0).as("lat"),
          (col("l_linenumber") * 1.0).as("lon"))
        .as[(Long, Int, Double, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (sid, it) =>
          val pts = it.map(r => Geo.Pt(r._2, r._3, r._4)).toIndexedSeq.sortBy(_.seq)
          val simplified = Geo.douglasPeucker(pts, 0.05)
          Iterator.single((sid, pts.length, simplified.length))
        }
        .toDF("shape_id", "n_before", "n_after")
    },
  )
}
