package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003): hash every k-token shingle, then keep the minimum hash of
  * each sliding window of `window` consecutive shingles, deduplicated
  * per document. The guarantee: any two documents sharing a token run
  * of at least k + window - 1 tokens share at least one fingerprint,
  * while storing ~1/window of the full shingle-hash set.
  *
  * Scale shape: one window function partitioned by doc_id (bounded by
  * document length, never data-scale) whose partitioning the following
  * per-doc aggregation reuses — one shuffle total. Hashing is codegen'd
  * `sha2`; fingerprints are 48-bit BIGINTs (hex → numeric so min() and
  * the aggregation stay in HashAggregate, cf. the MinHash note in
  * queries/LlmOps.scala).
  */
object Winnow {

  /** 3-token shingles of a tokenized text column. */
  def shingles(tokens: Column): Column =
    transform(sequence(lit(1), size(tokens) - 2),
      i => concat_ws(" ", element_at(tokens, i), element_at(tokens, i + 1),
        element_at(tokens, i + 2)))

  /** Per-doc sorted distinct window-min shingle hashes.
    * Input: (doc_id, toks array); output: (doc_id, fps array<bigint>).
    *
    * r18 OPT (guide §2.3/§2.4): the spread used to repartition the
    * EXPLODED (doc_id, pos, sh) rows — which shuffled the rendered
    * shingle strings (61.8 MB at sf1) and, worse, left the render
    * itself below the exchange on the scan's split count (event-log
    * profile: 5.5 s of the query's 6.3 s on 2 tasks). The spread now
    * repartitions DOC rows on doc_id: the window needs every doc's
    * shingles on one task anyway, so hash(doc_id) both satisfies the
    * window's clustering (its exchange disappears — one exchange
    * total, down from two) and runs the render + sha at full width.
    * A single pathological doc still serializes its own window — that
    * was equally true before, at the window exchange. */
  def fingerprints(docs: DataFrame, window: Int = 4): DataFrame = {
    // adaptive (cf. queries.fanout): only repartition when the source is
    // under-split, so production multi-file scans pay no extra exchange.
    // Width PINNED (r19, r18 VERDICT #4): bare repartition(col) is
    // REPARTITION_BY_COL, which AQE's byte-based coalescer may shrink —
    // and the shingle render + sha256 above this exchange is
    // compute-heavy relative to its bytes, exactly the hazard fanout()
    // and OrderedDigest pin against. Same input-derived session width,
    // not a local-core constant.
    val spread =
      if (docs.rdd.getNumPartitions >=
        docs.sparkSession.sparkContext.defaultParallelism) docs
      else docs.repartition(
        docs.sparkSession.sessionState.conf.numShufflePartitions, col("doc_id"))
    val h = spread
      .select(col("doc_id"), posexplode(shingles(col("toks"))).as(Seq("pos", "sh")))
      .select(col("doc_id"), col("pos"),
        conv(substring(sha2(col("sh"), 256), 1, 12), 16, 10).cast("long").as("hv"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(window - 1), 0)
    h.select(col("doc_id"), col("pos"), min("hv").over(w).as("fp"))
      .where(col("pos") >= window - 1) // first complete window (pos 0-based)
      .groupBy("doc_id")
      .agg(array_sort(collect_set(col("fp"))).as("fps"))
  }
}
