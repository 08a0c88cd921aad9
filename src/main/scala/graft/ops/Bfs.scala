package graft.ops

import graft.ops.Checkpoints.PinSyntax
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distances over an edge list — the third
  * iterative-graph primitive next to [[Components]] (dense min-label
  * fixpoint) and PageRank (fixed-round value iteration): a FRONTIER
  * (delta) iteration whose per-round work is proportional to the
  * newly-discovered layer, not to |V|.
  *
  * Each round is bounded by three shuffles over frontier-sized data:
  * expand (equi-join frontier→edges on the source endpoint), dedup
  * (min-distance aggregate of the expanded layer), and settle
  * (left-anti join against the already-discovered set). Distances are
  * exact BFS levels: a node's first discovery round is its hop
  * distance, and the in-round min() breaks simultaneous multi-path
  * discovery deterministically (all paths in the same round carry the
  * same d anyway).
  *
  * Scale: the anti-join reads ONE settled-id checkpoint that is
  * re-folded (settled ∪ new layer → fresh checkpoint, superseded
  * snapshot released) each round — constant plan width and O(|settled|)
  * per-round read at ANY depth, where the r10 shape unioned every prior
  * layer checkpoint and grew the plan linearly with rounds (r10 VERDICT
  * #6 / ADVICE). The fold costs one extra |settled|-row write per round
  * — the documented trade. Per-layer (id, d) checkpoints are still kept
  * as the RESULT (their union is the distance table; reading them once
  * at the end is free), so state is |V| rows across layers + |V|
  * settled ids + the (checkpointed-once) symmetrized edge list, and
  * lineage is cut every round. Rounds = eccentricity of the seed set,
  * which multi-source seeding keeps small on real graphs (supply-chain
  * / co-occurrence graphs: tens). The per-round driver action is the
  * frontier COUNT — O(1) result rows, no data collect. */
object Bfs {

  /** `distances(id, d)` for every node reachable from the seed set
    * (seeds themselves at d = 0; unreachable nodes are absent —
    * representing ∞ as a row is the caller's choice via a left join);
    * `iterations` expansion rounds ran; [[release]] drops the
    * checkpoint blocks backing the edge list and every layer. */
  final case class Distances(distances: DataFrame, iterations: Int,
      release: () => Unit)

  /** Run over `edges(src, dst)` (treated as undirected; both
    * orientations added internally) from `seeds(id)`. Ids may be any
    * orderable type; duplicate seeds and seeds absent from the graph
    * are fine (the latter stay isolated rows at d = 0). Throws if the
    * frontier is still non-empty after `maxIterations` rounds —
    * silently-truncated distances would corrupt any radius/reach
    * consumer. */
  def run(edges: DataFrame, seeds: DataFrame,
      maxIterations: Int = 50): Distances = {
    // symmetrize via one explode (2-branch union would re-evaluate the
    // upstream edge pipeline per branch), dedup, checkpoint ONCE: the
    // edge list is re-consumed every round.
    val e = edges.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .pin(false)
    val f0 = seeds.select(col("id")).distinct()
      .select(col("id"), lit(0L).as("d"))
      .pin(false)
    var layers = List(f0) // newest first; all checkpointed (the result)
    var extra = List.empty[DataFrame] // the final empty expansion
    // the ONE settled-id snapshot the anti-join reads — re-folded each
    // round so the plan never widens with depth. The fold is a LAZY
    // checkpoint: round r+1's count materializes it inside the round's
    // only job (reading the previous snapshot's blocks + the layer's
    // blocks — one extra |settled|-row write per round, the documented
    // trade), so a superseded snapshot can only be released one round
    // LATER, once the fold that reads it has materialized.
    var settled = f0.select("id").pin(false)
    var superseded: DataFrame = null
    var frontier = f0
    var n = frontier.count()
    var iter = 0
    while (n > 0) {
      if (iter >= maxIterations) {
        (layers ++ extra ++ Seq(e, settled) ++ Option(superseded))
          .foreach(Checkpoints.release(_))
        throw new IllegalStateException(
          s"BFS frontier still non-empty after $maxIterations rounds")
      }
      val next = e.join(frontier.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), (col("d") + lit(1L)).as("d"))
        .groupBy("id").agg(min("d").as("d"))
        .join(settled, Seq("id"), "left_anti")
        .pin(false)
      // the round's ONLY action: materializes the layer's checkpoint
      // blocks, the settled fold it anti-joins against, and the
      // termination guard in one job
      n = next.count()
      // the fold `settled` is now materialized, so the snapshot it
      // folded over is no longer read by anything — release it
      if (superseded != null) { Checkpoints.release(superseded); superseded = null }
      if (n > 0) {
        superseded = settled
        settled = settled.unionByName(next.select("id")).pin(false)
        layers ::= next
        frontier = next
      } else extra ::= next
      iter += 1
    }
    val all = layers ++ extra ++ Seq(settled) ++ Option(superseded)
    Distances(
      layers.map(_.toDF("id", "d")).reduce(_ unionByName _),
      iter,
      { () => (all ++ Seq(e)).foreach(Checkpoints.release(_, blocking = true)) })
  }
}
