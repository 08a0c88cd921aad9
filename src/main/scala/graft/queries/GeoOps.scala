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
        |                 + (lon + 43.0) * (lon + 43.0)) * 1000000) AS BIGINT)
        |         AS dist2_scaled
        |FROM stops
        |WHERE lat BETWEEN 45.0 AND 55.0 AND lon BETWEEN -45.0 AND -41.0
        |ORDER BY dist2_scaled, stop_id
        |LIMIT 10
        |""") { (s, d) =>
      val stops = Tables.customer(s, d)
        .select(col("c_custkey").as("stop_id"),
          ((col("c_custkey") % 1800) / 10.0 - 90.0).as("lat"),
          ((col("c_custkey") % 3600) / 10.0 - 180.0).as("lon"))
      stops
        .where(col("lat").between(45.0, 55.0) && col("lon").between(-45.0, -41.0))
        .select(col("stop_id"),
          floor(((col("lat") - 50.0) * (col("lat") - 50.0) +
            (col("lon") + 43.0) * (col("lon") + 43.0)) * 1000000)
            .cast("long").as("dist2_scaled"))
        .orderBy("dist2_scaled", "stop_id")
        .limit(10)
    },

    // IVF ANN with a COMPUTED coarse quantizer (graft.ops.Ivf): build
    // the index (deterministic seeds + one Lloyd step), probe 2 cells
    // per query, exact re-rank. With fixed seeds and a fixed iteration
    // count the whole build is deterministic relational algebra, so it
    // IS SQL-expressible — the oracle below replays it in DuckDB:
    //  - l2 = list_reduce of the per-dimension squared diffs, the same
    //    left-fold order as the codegen'd l2_sq (0.0+t1 == t1, so the
    //    missing explicit init is harmless);
    //  - argmin = row_number over (d2, cell) == Spark min(struct);
    //  - Lloyd mean = CAST(DECIMAL(38,12) sum AS DOUBLE)/count — one
    //    IEEE double division on both engines (double→DECIMAL casts
    //    round half-away-from-zero in both);
    //  - final rank by exact scaled-int dot product.
    "llm_ann_ivf_centroids" -> QueryDef(
      doc = "IVF ANN: computed centroids, nprobe equi-join, exact re-rank",
      oracle = {
        def l2(a: String, b: String) =
          s"list_reduce([($a[i] - $b[i]) * ($a[i] - $b[i]) " +
            s"FOR i IN range(1, len($a) + 1)], (x, y) -> x + y)"
        s"""
        |WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e
        |  FROM embeddings
        |), seeds AS (
        |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cell
        |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
        |), c0 AS (
        |  SELECT s.cell, v.e AS centroid FROM seeds s JOIN v USING (vec_id)
        |), a0 AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT v.vec_id, c0.cell,
        |           row_number() OVER (PARTITION BY v.vec_id
        |                              ORDER BY ${l2("v.e", "c0.centroid")}, c0.cell) AS rn
        |    FROM v CROSS JOIN c0)
        |  WHERE rn = 1
        |), mean1 AS (
        |  SELECT a0.cell, i AS pos,
        |         CAST(sum(CAST(v.e[i] AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS m
        |  FROM a0 JOIN v USING (vec_id),
        |       unnest(generate_series(1, len(v.e))) AS t(i)
        |  GROUP BY a0.cell, i
        |), c1 AS (
        |  SELECT cell, list(m ORDER BY pos) AS centroid FROM mean1 GROUP BY cell
        |), a1 AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT v.vec_id, c1.cell,
        |           row_number() OVER (PARTITION BY v.vec_id
        |                              ORDER BY ${l2("v.e", "c1.centroid")}, c1.cell) AS rn
        |    FROM v CROSS JOIN c1)
        |  WHERE rn = 1
        |), q AS (
        |  SELECT e.vec_id AS qid, e.embedding AS qe,
        |         [CAST(x AS DOUBLE) FOR x IN e.embedding] AS qe_d
        |  FROM embeddings e WHERE e.vec_id < 8
        |), probed AS (
        |  SELECT qid, qe, cell FROM (
        |    SELECT q.qid, q.qe, c1.cell,
        |           row_number() OVER (PARTITION BY q.qid
        |                              ORDER BY ${l2("q.qe_d", "c1.centroid")}, c1.cell) AS rn
        |    FROM q CROSS JOIN c1)
        |  WHERE rn <= 2
        |), cand AS (
        |  SELECT e.vec_id AS cid, e.embedding AS ce, a1.cell
        |  FROM embeddings e JOIN a1 ON a1.vec_id = e.vec_id
        |), scored AS (
        |  SELECT p.qid, c.cid,
        |         CAST(${LlmOps.dotSql("p.qe", "c.ce")} AS BIGINT) AS dot_scaled
        |  FROM probed p JOIN cand c USING (cell)
        |)
        |SELECT qid, cid, dot_scaled, rank FROM (
        |  SELECT qid, cid, dot_scaled,
        |         row_number() OVER (PARTITION BY qid
        |                            ORDER BY dot_scaled DESC, cid) AS rank
        |  FROM scored)
        |WHERE rank <= 10
        |ORDER BY qid, rank
        |"""
      }) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val (assign, centroids) = graft.ops.Ivf.build(e, k = 8)
      graft.ops.Ivf.search(s, e, assign, centroids,
        e.where(col("vec_id") < 8), k = 10, nprobe = 2)
    },

    // C7 --min-shapes distributed: Douglas-Peucker per shape via
    // flatMapGroups (bounded per-shape groups), polylines synthesized
    // from lineitem. The kept-point set of DP is independent of the
    // traversal order, every arithmetic step is IEEE exact-rounded
    // (see Geo.perpDistance), the points are totally ordered by
    // (seq, lat, lon) — (l_orderkey, l_linenumber) is NOT unique in the
    // test data — and the first-max argmax equals min-idx-among-max, so
    // the recursion IS SQL-expressible: the oracle replays it with a
    // DuckDB recursive CTE over (shape, lo, hi) segments.
    "c7_min_shapes" -> QueryDef(
      doc = "Douglas-Peucker polyline simplification per shape group",
      oracle = """
        |WITH RECURSIVE pts AS (
        |  SELECT shape_id,
        |         row_number() OVER (PARTITION BY shape_id
        |                            ORDER BY seq, lat, lon) AS idx,
        |         lat, lon
        |  FROM (SELECT l_orderkey AS shape_id, l_linenumber AS seq,
        |               (l_partkey % 100) / 10.0 AS lat,
        |               l_linenumber * 1.0 AS lon
        |        FROM lineitem)
        |), bounds AS (
        |  SELECT shape_id, min(idx) AS lo, max(idx) AS hi, count(*) AS n
        |  FROM pts GROUP BY shape_id
        |), seg AS (
        |  SELECT shape_id, lo, hi FROM bounds
        |  UNION ALL
        |  SELECT spl.shape_id,
        |         CASE w.i WHEN 0 THEN spl.lo ELSE spl.best END AS lo,
        |         CASE w.i WHEN 0 THEN spl.best ELSE spl.hi END AS hi
        |  FROM (
        |    SELECT c.shape_id, c.lo, c.hi, c.maxd, min(c.idx) AS best
        |    FROM (
        |      SELECT d.shape_id, d.lo, d.hi, d.idx, d.d,
        |             max(d.d) OVER (PARTITION BY d.shape_id, d.lo, d.hi) AS maxd
        |      FROM (
        |        SELECT s.shape_id, s.lo, s.hi, p.idx,
        |               CASE WHEN (b.lon - a.lon) * (b.lon - a.lon)
        |                         + (b.lat - a.lat) * (b.lat - a.lat) = 0
        |                 THEN sqrt((p.lon - a.lon) * (p.lon - a.lon)
        |                           + (p.lat - a.lat) * (p.lat - a.lat))
        |                 ELSE abs((b.lat - a.lat) * p.lon - (b.lon - a.lon) * p.lat
        |                          + b.lon * a.lat - b.lat * a.lon)
        |                      / sqrt((b.lon - a.lon) * (b.lon - a.lon)
        |                             + (b.lat - a.lat) * (b.lat - a.lat))
        |               END AS d
        |        FROM seg s
        |        JOIN pts a ON a.shape_id = s.shape_id AND a.idx = s.lo
        |        JOIN pts b ON b.shape_id = s.shape_id AND b.idx = s.hi
        |        JOIN pts p ON p.shape_id = s.shape_id
        |                  AND p.idx > s.lo AND p.idx < s.hi
        |      ) d
        |    ) c
        |    WHERE c.d = c.maxd
        |    GROUP BY c.shape_id, c.lo, c.hi, c.maxd
        |    HAVING c.maxd > 0.05
        |  ) spl
        |  CROSS JOIN (SELECT unnest([0, 1]) AS i) w
        |), kept AS (
        |  SELECT DISTINCT shape_id, idx FROM (
        |    SELECT shape_id, lo AS idx FROM seg
        |    UNION ALL SELECT shape_id, hi FROM seg)
        |)
        |SELECT b.shape_id, CAST(b.n AS BIGINT) AS n_before,
        |       CAST(k.n_kept AS BIGINT) AS n_after
        |FROM bounds b
        |JOIN (SELECT shape_id, count(*) AS n_kept FROM kept GROUP BY shape_id) k
        |  USING (shape_id)
        |ORDER BY b.shape_id
        |""") { (s, d) =>
      import s.implicits._
      import graft.gtfs.Geo
      fanout(Tables.lineitem(s, d), col("l_orderkey"))
        .select(col("l_orderkey").as("shape_id"), col("l_linenumber").as("seq"),
          ((col("l_partkey") % 100) / 10.0).as("lat"),
          (col("l_linenumber") * 1.0).as("lon"))
        .as[(Long, Int, Double, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (sid, it) =>
          // total order (seq alone is non-unique) → deterministic DP
          val pts = it.map(r => Geo.Pt(r._2, r._3, r._4)).toIndexedSeq
            .sortBy(p => (p.seq, p.lat, p.lon))
          val simplified = Geo.douglasPeucker(pts, 0.05)
          Iterator.single((sid, pts.length.toLong, simplified.length.toLong))
        }
        .toDF("shape_id", "n_before", "n_after")
    },

    // 2D spatial self-join (distance-within join): the join form of
    // L3's grid index. Points carry an integer DECIDEGREE grid cell
    // (cell = coord div 5, cell size >= the search radius); one side
    // explodes over its 3x3 neighbor cells, the other keeps its home
    // cell, so the pairing is an EQUI join on the cell key — each
    // candidate pair arises exactly once (b's home cell appears at
    // most once in a's neighborhood), no dedup pass. Exact predicate
    // dlat^2 + dlon^2 < 25 in pure integer arithmetic (engine-exact,
    // unlike trig haversine — GeoSpec covers that variant). At scale:
    // shuffle keys are cells (bounded fan-out of 9), skewed cells are
    // ordinary AQE skew-join work, never a cross product. The oracle
    // is a BRUTE-FORCE pair scan — independent of the grid algorithm.
    "q18_geo_pairs" -> QueryDef(
      doc = "distance-within self-join via 3x3 neighbor-cell equi join",
      oracle = """
        |WITH stops AS (
        |  SELECT c_custkey AS id,
        |         CAST(c_custkey % 1800 AS BIGINT) - 900 AS lat_d,
        |         CAST(c_custkey % 3600 AS BIGINT) - 1800 AS lon_d
        |  FROM customer
        |  WHERE CAST(c_custkey % 1800 AS BIGINT) - 900 BETWEEN -250 AND 250
        |)
        |SELECT a.id AS stop_id, count(*) AS n_neighbors,
        |       min((a.lat_d - b.lat_d) * (a.lat_d - b.lat_d)
        |         + (a.lon_d - b.lon_d) * (a.lon_d - b.lon_d)) AS min_d2
        |FROM stops a JOIN stops b
        |  ON a.id <> b.id
        | AND (a.lat_d - b.lat_d) * (a.lat_d - b.lat_d)
        |   + (a.lon_d - b.lon_d) * (a.lon_d - b.lon_d) < 25
        |GROUP BY 1 ORDER BY 1
        |""") { (s, d) =>
      def stops = Tables.customer(s, d)
        .select(col("c_custkey").as("id"),
          ((col("c_custkey") % 1800).cast("long") - 900).as("lat_d"),
          ((col("c_custkey") % 3600).cast("long") - 1800).as("lon_d"))
        .where(col("lat_d").between(-250, 250))
      // floor-div cells: pmod-correct for negatives via the (x - (x %
      // 5 + 5) % 5) / 5 identity is unnecessary — Spark's `div` and
      // the neighbor explode only need CONSISTENT cells, and both
      // sides use the same expression; +/-1 covers truncation edges
      val a = stops
        .withColumn("dci", explode(sequence(lit(-1), lit(1))))
        .withColumn("dcj", explode(sequence(lit(-1), lit(1))))
        .select(col("id").as("a_id"), col("lat_d").as("a_lat"),
          col("lon_d").as("a_lon"),
          (expr("lat_d div 5") + col("dci")).as("ci"),
          (expr("lon_d div 5") + col("dcj")).as("cj"))
      val b = stops.select(col("id").as("b_id"), col("lat_d").as("b_lat"),
        col("lon_d").as("b_lon"),
        expr("lat_d div 5").as("ci"), expr("lon_d div 5").as("cj"))
      val d2 = (col("a_lat") - col("b_lat")) * (col("a_lat") - col("b_lat")) +
        (col("a_lon") - col("b_lon")) * (col("a_lon") - col("b_lon"))
      a.join(b, Seq("ci", "cj"))
        .where(col("a_id") =!= col("b_id") && d2 < 25)
        .groupBy(col("a_id").as("stop_id"))
        .agg(count(lit(1)).as("n_neighbors"), min(d2).as("min_d2"))
    },
  )
}
