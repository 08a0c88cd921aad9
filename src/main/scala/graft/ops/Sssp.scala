package graft.ops

import graft.ops.Checkpoints.PinSyntax
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round Bellman-Ford relaxation over a weighted edge list —
  * the weighted generalization of [[Bfs]] (all weights 1 ⇒ identical
  * distances) and the fifth graph primitive next to PageRank
  * (fixed-round value iteration), components (dense min-label
  * fixpoint), triangles (bounded multi-way join) and BFS
  * (frontier/delta iteration).
  *
  * Semantics are BOUNDED BY CONSTRUCTION: after `rounds` relaxations
  * the distance at a node is the cheapest cost over paths of ≤ rounds
  * hops — a well-defined operator in its own right (cheapest reach
  * within k supply tiers), chosen over run-to-convergence for the same
  * reason q22 pins 3 PageRank iterations: a weighted shortest path's
  * HOP count is bounded only by component size, not diameter, so no
  * small fixed chain is provably convergent, and an oracle can only
  * replay a fixed chain. Relaxation is idempotent once converged, so
  * the loop exits early when a round improves nothing (same result,
  * fewer jobs) — `iterations` reports the rounds actually run.
  *
  * Shape per round (the [[Components]] idiom, with min(d+w) in place
  * of min(label)): ONE shuffle — join the current distances to edge
  * sources, min-aggregate d+w per destination; weight-0 self-loops
  * (added internally) both keep every reached node's own distance in
  * the min AND carry it out as `prev`, so the improved-count guard
  * needs no second join. Distances only ever decrease, making the
  * guard exact. Per-round state is the reached-node distance table;
  * lineage is cut by per-round localCheckpoint and superseded
  * snapshots release immediately, so memory holds 2 snapshots + 1
  * edge list regardless of round count. */
object Sssp {

  /** `distances(id, d)` for every node reachable from the seed set in
    * ≤ `rounds` hops (seeds at d = 0, unreachable nodes absent);
    * `iterations` relaxation rounds actually ran (< rounds iff the
    * relaxation converged early); [[release]] drops the checkpoint
    * blocks backing the edge list and the final distance snapshot. */
  final case class Distances(distances: DataFrame, iterations: Int,
      release: () => Unit)

  /** Run over `edges(src, dst, w)` (treated as undirected; both
    * orientations added internally; weights must be ≥ 0 longs — a
    * negative weight would make the bounded result order-dependent)
    * from `seeds(id)`. Duplicate seeds and seeds absent from the graph
    * are fine (the latter stay isolated rows at d = 0: a weight-0
    * self-loop is added for every seed as well as every edge
    * endpoint). */
  def run(edges: DataFrame, seeds: DataFrame, rounds: Int): Distances = {
    // rounds = 0 would silently return seeds-only "distances" — make the
    // misuse loud. Weight non-negativity stays the CALLER's contract
    // (documented above): validating it would cost a full pass over the
    // edge list before any useful work.
    require(rounds >= 1, s"rounds must be >= 1 (got $rounds)")
    // symmetrize via one explode, add weight-0 self-loops for BOTH
    // endpoints and for the seeds (any reached node must keep its
    // distance through the min; a seed with no incident edge would
    // otherwise vanish after round 1), dedup keeping the cheapest
    // parallel edge, checkpoint ONCE.
    val sym = edges.select(explode(array(
        struct(col("src"), col("dst"), col("w")),
        struct(col("dst").as("src"), col("src").as("dst"), col("w")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
    val e = sym
      .unionByName(sym.select(col("src"), col("src").as("dst"), lit(0L).as("w")))
      .unionByName(sym.select(col("dst").as("src"), col("dst"), lit(0L).as("w")))
      .unionByName(seeds.select(col("id").as("src"), col("id").as("dst"),
        lit(0L).as("w")))
      .groupBy("src", "dst").agg(min("w").as("w"))
      .pin(false)
    var distCp = seeds.select(col("id")).distinct()
      .select(col("id").as("node"), lit(0L).as("d"))
      .pin(false)
    var dist = distCp
    var iter = 0
    var improved = 1L
    while (improved > 0 && iter < rounds) {
      // the self-loop row (dst = src, w = 0) carries the node's own d
      // out as `prev`; d is monotone non-increasing so `<` counts all
      // improvements. Newly-reached nodes have prev NULL (no self-loop
      // row joined a previous distance... their self-loop DOES exist in
      // e but only fires once the node has a distance row) — count them
      // as improved via the null check.
      val next = e.join(dist.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("d") + col("w")).as("d"),
          min(when(col("dst") === col("src"), col("d"))).as("prev"))
        .pin(false)
      improved = next.where(col("prev").isNull || col("d") < col("prev")).count()
      Checkpoints.release(distCp)
      distCp = next
      dist = next.select("node", "d")
      iter += 1
    }
    val finalCp = distCp
    Distances(dist.select(col("node").as("id"), col("d")), iter,
      { () =>
        Checkpoints.release(finalCp, blocking = true)
        Checkpoints.release(e, blocking = true)
      })
  }
}
