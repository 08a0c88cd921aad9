package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall/scaling properties of the banded cosine LSH (round-2 VERDICT
  * #5: bucket count must scale with the corpus, banding must keep
  * recall for true near-duplicates). */
class CosineLshSpec extends SparkSpec {
  import spark.implicits._

  /** testdata embeddings ∪ a barely-perturbed copy of each vector
    * (first component nudged by +0.02): 500 planted pairs with
    * cos ≥ 0.999 — the near-duplicates LSH exists to find (the natural
    * pairs in the testdata top out at cos ≈ 0.51). */
  private lazy val planted = {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val dup = e.select((col("vec_id") + 100000).as("vec_id"),
      concat(
        transform(slice(col("embedding"), 1, 1), x => x + lit(0.02f)),
        slice(col("embedding"), 2, 1000)).as("embedding"))
    (e.unionByName(dup), e.select("vec_id").as[Long].collect().toSet)
  }

  test("planted near-duplicate pairs are recalled at >= 95%") {
    val (corpus, ids) = planted
    val cand = CosineLsh.candidates(corpus, bitsPerBand = 6, nBands = 2)
      .as[(Long, Long)].collect().toSet
    val hits = ids.count(id => cand.contains((id, id + 100000)))
    val recall = hits.toDouble / ids.size
    assert(recall >= 0.95, s"recall $recall (${hits}/${ids.size})")
  }

  test("more bits per band → fewer candidate pairs (the scale knob)") {
    val (corpus, _) = planted
    val coarse = CosineLsh.candidates(corpus, bitsPerBand = 2, nBands = 2).count()
    val fine = CosineLsh.candidates(corpus, bitsPerBand = 6, nBands = 2).count()
    assert(fine < coarse,
      s"2^6 buckets must prune harder than 2^2 (got $fine vs $coarse)")
  }

  test("signKey matches an independent JVM sha256 derivation") {
    // r12 moved the sign hashes to a per-dimension broadcast table
    // (planeSignTable); this pins the WHOLE signKey path — scaled-int
    // dims, table join, sign sums, bit string — against a from-scratch
    // JVM computation of the published formula (plane p's sign for
    // dimension i = hex char p+1 of sha256(i) >= '8'), so a refactor
    // of either side cannot silently skew every band key.
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding").limit(50)
    val got = CosineLsh.signKey(e, bits = 8)
      .as[(Long, String)].collect().toMap
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hexByDim = (1 to 128).map(i => i ->
      md.digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    ).toMap
    val rows = e.as[(Long, Array[Float])].collect()
    assert(rows.nonEmpty && got.size == rows.length)
    rows.foreach { case (id, emb) =>
      val key = (0 until 8).map { p =>
        val s = emb.zipWithIndex.map { case (v, i0) =>
          val vi = math.floor(v.toDouble * 1000000 + 0.5).toLong
          if (hexByDim(i0 + 1).charAt(p) >= '8') vi else -vi
        }.sum
        if (s > 0) '1' else '0'
      }.mkString
      assert(got(id) == key, s"vec $id: got ${got(id)}, expected $key")
    }
  }

  test("derivedBits: integer threshold chain, one bit per doubling, capped") {
    import CosineLsh.derivedBits
    // exactly at a threshold stays below it; one row past it crosses
    assert(derivedBits(0) == 6 && derivedBits(2000) == 6)
    assert(derivedBits(2001) == 7 && derivedBits(4000) == 7)
    assert(derivedBits(4001) == 8)
    assert(derivedBits(20000) == 10) // the sf1 corpus
    assert(derivedBits(Long.MaxValue) == 32, "saturates at the (r13) cap")
    // r12 VERDICT #8: the raised cap must not move any width the scale
    // sweeps already measured — every n ≤ unit·2^10 (the old cap's
    // saturation point) derives the SAME bits as under cap=16, so the
    // sf0.1/sf1/sf10 LSH keys (incl. sf10's exactly-2M corpus) are
    // bit-identical under both caps
    val measured = Seq(1L, 2000, 20000, 200000, 1000000, 2000000, 2048000)
    assert(measured.forall(n => derivedBits(n) == derivedBits(n, cap = 16)))
    assert(derivedBits(2000000) == 16 && derivedBits(2000000, cap = 16) == 16)
    // past the old saturation the new cap keeps adding bits: the pair
    // space stays occupancy-bounded through ≥10^9-row corpora
    assert(derivedBits(2048001) == 17, "old cap saturated here; new cap must not")
    assert(derivedBits(1000000000L) == 25) // 2000·2^18 < 1e9 ≤ 2000·2^19
    assert(derivedBits(2000L << 26) == 32 && derivedBits(2000L << 25) == 31)
    // monotone non-decreasing (sampled)
    val pts = Seq(1L, 100, 2000, 2001, 5000, 50000, 1000000, 100000000,
      1000000000L, Long.MaxValue / 2)
    assert(pts.zip(pts.tail).forall { case (a, b) =>
      derivedBits(a) <= derivedBits(b) })
    // the SQL chain is the same rule — evaluate the EMITTED text in
    // Spark SQL (ANSI CASE chain, the same text the DuckDB oracle
    // splices), ExactRankSpec-style, so the two engines' knobs cannot
    // drift at any n including past the old cap
    pts.foreach { n =>
      val viaSql = spark.sql(
        s"SELECT ${CosineLsh.derivedBitsSql(n.toString)} AS b")
        .head.getInt(0)
      assert(viaSql == derivedBits(n), s"n=$n: SQL $viaSql, Scala ${derivedBits(n)}")
    }
  }

  test("second-digest planes (64+): signKey matches an independent JVM derivation") {
    // the raised cap lets a band spend >64 planes; indices 64-127 read
    // sha256(i || '+') — pin the whole path against from-scratch JVM
    // crypto exactly like the first-digest test above
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding").limit(20)
    val bits = 70 // planes 0..69: spans the digest boundary
    val got = CosineLsh.signKey(e, bits).as[(Long, String)].collect().toMap
    def sha(s: String): String = java.security.MessageDigest
      .getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val rows = e.as[(Long, Array[Float])].collect()
    assert(rows.nonEmpty && got.size == rows.length)
    rows.foreach { case (id, emb) =>
      val key = (0 until bits).map { p =>
        val s = emb.zipWithIndex.map { case (v, i0) =>
          val i = (i0 + 1).toString
          val hex = if (p < 64) sha(i) else sha(i + "+")
          val vi = math.floor(v.toDouble * 1000000 + 0.5).toLong
          if (hex.charAt(p % 64) >= '8') vi else -vi
        }.sum
        if (s > 0) '1' else '0'
      }.mkString
      assert(got(id) == key, s"vec $id: got ${got(id)}, expected $key")
    }
  }

  test("wider planeStride: keys are prefixes — candidates shrink monotonically") {
    // with a fixed stride, the band key at b bits is a PREFIX of the key
    // at b+1 bits, so candidate sets must be nested (what lets a static
    // oracle compute stride bits and truncate to the derived width)
    val (corpus, _) = planted
    val c6 = CosineLsh.candidates(corpus, bitsPerBand = 6, nBands = 2,
      planeStride = 16).as[(Long, Long)].collect().toSet
    val c8 = CosineLsh.candidates(corpus, bitsPerBand = 8, nBands = 2,
      planeStride = 16).as[(Long, Long)].collect().toSet
    assert(c8.subsetOf(c6), s"${(c8 -- c6).size} pairs appeared at 8 bits")
    assert(c8.size < c6.size)
  }

  test("signKey: deterministic hash grid, 2^bits cells, '' at bits = 0") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val k3 = CosineLsh.signKey(e, 3).as[(Long, String)].collect().toMap
    assert(k3.values.forall(k => k.length == 3 && k.forall(c => c == '0' || c == '1')))
    assert(k3.values.toSet.size <= 8)
    // deterministic across runs
    assert(CosineLsh.signKey(e, 3).as[(Long, String)].collect().toMap == k3)
    // 4-bit keys extend 3-bit keys (prefix property, same plane sequence)
    val k4 = CosineLsh.signKey(e, 4).as[(Long, String)].collect().toMap
    assert(k3.forall { case (id, k) => k4(id).startsWith(k) })
    val k0 = CosineLsh.signKey(e, 0).as[(Long, String)].collect().toMap
    assert(k0.values.forall(_ == ""))
  }
}
