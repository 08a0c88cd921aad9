package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF ANN: deterministic build, equi-join probe (no corpus cross
  * join), and recall vs the brute-force baseline. */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("build is deterministic and assigns every vector to one of k cells") {
    val e = Tables.embeddings(spark, sf)
    val (a1, c1) = Ivf.build(e, k = 8)
    val (a2, _) = Ivf.build(e, k = 8)
    assert(a1.count() == e.count())
    assert(c1.count() == 8)
    assert(a1.select("cell").distinct().count() <= 8)
    // bit-identical across builds
    assert(a1.exceptAll(a2).isEmpty && a2.exceptAll(a1).isEmpty)
  }

  test("multi-pass build matches the fused single-pass plan and release frees its blocks") {
    val e = Tables.embeddings(spark, sf)
    // iterations = 2 takes the checkpoint-and-restart path (lazy vector
    // checkpoint + eager k-row centroid snapshots, nothing collected to
    // the driver); iterations = 1 is the fused zero-checkpoint plan
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ix = Ivf.buildIndex(e, k = 8, iterations = 2)
    assert(ix.assignments.count() == e.count())
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.nonEmpty, "checkpointed vector blocks should be persisted")
    ix.release()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty, s"release() left persisted RDDs: $after")

    // fused path: no persisted blocks at all, release is a safe no-op
    val fused = Ivf.buildIndex(e, k = 8, iterations = 1)
    assert(fused.assignments.count() == e.count())
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
    fused.release()
  }

  test("search probes cells via equi join and reaches useful recall") {
    val e = Tables.embeddings(spark, sf)
    val (assign, centroids) = Ivf.build(e, k = 8)
    val queries = e.where(col("vec_id") < 10)
    val got = Ivf.search(spark, e, assign, centroids, queries, k = 10, nprobe = 3)

    // no corpus-wide cartesian: the only BroadcastNestedLoop allowed is
    // against the bounded centroid table
    val plan = got.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), s"corpus cross join!\n$plan")

    // brute-force ground truth with the same scoring
    graft.functions.DotScaled.register(spark)
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy("qid").orderBy(desc("ds"), asc("cid"))
    val truth = c.crossJoin(broadcast(q))
      .withColumn("ds", expr("dot_scaled(qe, ce)"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 10)
      .select("qid", "cid")

    val hits = got.select("qid", "cid").intersect(truth).count().toDouble
    val recall = hits / truth.count()
    // random 64-dim data, 3/8 cells probed → recall well above the
    // 3/8 = 0.375 random-cell floor because near vectors share cells
    assert(recall >= 0.5, s"recall@10 = $recall")
    // each query returns exactly k results
    assert(got.groupBy("qid").count().where(col("count") =!= 10).count() == 0)
  }
}
