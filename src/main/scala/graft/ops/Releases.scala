package graft.ops

/** Deferred release handles for checkpoint-backed results
  * ([[Components.Labels.release]], [[Ivf.Index.release]]).
  *
  * The ownership problem: a query function returns a lazy DataFrame
  * whose plan reads localCheckpoint blocks, so the operator that
  * created them cannot release them before returning — only the CALLER
  * knows when the result has been materialized. Query sites register
  * their handles here; the entry points that materialize results
  * (Verify, Bench, Probe — and any long-lived `openLatestImport`-style
  * service loop) call [[drain]] AFTER each query's action completes.
  * Without the drain, each fixpoint/multi-pass-IVF run leaks one
  * checkpointed snapshot into the block manager for the life of the
  * session (bench/verify sessions exit, so they never noticed).
  *
  * Handles are idempotent (RDD.unpersist is), so a double drain is
  * safe; an undrained queue is only a memory leak, never a correctness
  * problem. */
object Releases {
  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]

  /** Register a release handle to run at the next [[drain]]. */
  def defer(f: () => Unit): Unit = pending.add(f)

  /** Run and clear all pending handles. Call only AFTER the query
    * result consuming the checkpoint blocks has been materialized. */
  def drain(): Unit = {
    var f = pending.poll()
    while (f != null) { f(); f = pending.poll() }
  }
}
