package graft.ops

import graft.ops.Checkpoints.PinSyntax
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list by min-label propagation to a
  * FIXPOINT — the production path behind the `llm_dedup_cluster` query
  * (queries/LlmOps.scala), whose inline 2-round form is exact only for
  * clusters of diameter ≤ 2 and documents this loop as the general
  * case. Pregel-style: each round is ONE shuffle (join labels to edge
  * endpoints + min-aggregate), and labels only ever decrease, so the
  * changed-count convergence guard is exact.
  *
  * Scale: state per round is |V| labels + the (checkpointed-once) edge
  * list; rounds = cluster diameter (near-dup clusters: single digits).
  * The per-round driver action is a COUNT — O(1) result rows — not a
  * data collect. Lineage is cut every round by a localCheckpoint, and
  * the previous round's blocks are unpersisted as soon as they are
  * superseded, so memory held is 2 label snapshots + 1 edge list
  * regardless of round count. */
object Components {

  /** A converged labeling: `components(id, component)` where component
    * is the minimum vertex id reachable from `id`; `iterations` rounds
    * were run; [[release]] drops the localCheckpoint blocks backing
    * both the edge list and the final labels — call it when done. */
  final case class Labels(components: DataFrame, iterations: Int,
      release: () => Unit)

  /** Run to fixpoint over `edges(src, dst)` (treated as undirected;
    * both orientations and self-loops are added internally, so every
    * endpoint labels itself even when isolated). Ids may be any
    * orderable type. Throws if `maxIterations` rounds do not converge —
    * silently-partial clusters would corrupt dedup canonicalization.
    *
    * `shortcut` (default on) adds a POINTER-JUMPING step to each round:
    * after the neighbor-min propagate, label(v) ← label(label(v)) — the
    * classic path-compression that makes effective propagation distance
    * roughly DOUBLE per round, so convergence takes O(log diameter)
    * rounds instead of O(diameter). The label is always a node id and
    * every node id has a label row (self-loops), so the jump is one
    * equi join of the round's label table against itself. Cost: one
    * extra |V|-row shuffle per round — a clear win once the diameter
    * exceeds a handful (at 100 TB graph scale, rounds are the dominant
    * term: each is a full synchronization barrier). Pass false for
    * known tiny-diameter inputs (near-dup clusters: d ≤ 3) where
    * halving 3 rounds cannot pay for the extra per-round shuffle. */
  def run(edges: DataFrame, maxIterations: Int = 50,
      shortcut: Boolean = true): Labels = {
    // symmetrize via one explode (per the llm_dedup_cluster lineage
    // note: a 2-branch union would re-evaluate the candidate pipeline
    // per branch), add self-loops, dedup — then checkpoint ONCE: the
    // edge list is re-consumed every round.
    val sym = edges.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val e = sym.unionByName(sym.select(col("src"), col("src").as("dst")))
      .distinct()
      .pin(false) // lazy: round 1 below materializes it
    var labelsCp = e.groupBy("src").agg(min("dst").as("label"))
      .pin(false)
    var labels = labelsCp // (src, label) view of the current checkpoint
    var iter = 1
    var changed = 1L
    while (changed > 0) {
      if (iter >= maxIterations) {
        Checkpoints.release(labelsCp); Checkpoints.release(e)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIterations rounds")
      }
      // label(v) ← min over neighbors u of label(u); the self-loop row
      // (dst = src) both includes v's own label in the min AND carries
      // it out as `prev`, so the convergence count needs NO second join
      // against the previous snapshot. Labels are monotone
      // non-increasing, so `<` counts all changes — `prev` is the label
      // BEFORE the round, so the guard also sees shortcut-only
      // improvements. `next` stays the RAW checkpointed Dataset —
      // release() walks its analyzed plan for the LogicalRDD, which any
      // wrapping Project (select/withColumnRenamed) would hide.
      val prop0 = e.join(labels.withColumnRenamed("src", "dst"), Seq("dst"))
        .groupBy("src")
        .agg(min("label").as("label"),
          min(when(col("dst") === col("src"), col("label"))).as("prev"))
      var propCp: Option[DataFrame] = None
      val next = (if (!shortcut) prop0 else {
        // pointer jump: label ← label(label). The lazy checkpoint makes
        // the propagate subtree compute ONCE although the jump join
        // consumes it on both sides; its blocks release right after the
        // count materializes the jumped snapshot. Left join + coalesce
        // is pure defense — every label IS a node id with a row.
        val prop = prop0.pin(false)
        propCp = Some(prop)
        prop.join(
            prop.select(col("src").as("label"), col("label").as("label2")),
            Seq("label"), "left")
          .select(col("src"),
            coalesce(col("label2"), col("label")).as("label"), col("prev"))
      }).pin(false)
      // this count is the round's ONLY action: it materializes next's
      // checkpoint blocks and computes the convergence guard in one job
      changed = next.where(col("label") < col("prev")).count()
      propCp.foreach(Checkpoints.release(_)) // jump input, superseded
      Checkpoints.release(labelsCp) // superseded snapshot
      labelsCp = next
      labels = next.select("src", "label")
      iter += 1
    }
    val finalCp = labelsCp
    Labels(labels.select(col("src").as("id"), col("label").as("component")),
      iter, { () =>
        Checkpoints.release(finalCp, blocking = true)
        Checkpoints.release(e, blocking = true)
      })
  }
}

// Checkpoints (the snapshot/release helper these ops share) lives in
// ops/Checkpoints.scala since the r12 conf-gated reliable mode.
