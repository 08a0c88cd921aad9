package graft.ops

import graft.SparkSpec

/** Salted skew-join: identical results to the plain join, hot key
  * scattered over `salt` shards. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin result equals plain join on skewed data") {
    // 90% of big rows share one hot key
    val big = (1 to 5000).map(i => (if (i % 10 == 0) s"k$i" else "hot", i))
      .toDF("k", "v")
    val small = Seq(("hot", "H"), ("k10", "A"), ("k20", "B"))
      .toDF("k", "name")
    val plain = big.join(small, "k").select("k", "v", "name")
    val salted = Joins.saltedJoin(big, small, "k", salt = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val big = (1 to 50000).map(i =>
        (if (i % 100 == 0) s"k$i" else "hot", s"payload-$i")).toDF("k", "v")
      val small = (1 to 20).map(i => (if (i % 2 == 0) "hot" else s"k$i", i))
        .toDF("k", "w")
      val joined = big.join(small, "k")
      // execute THIS QueryExecution so its plan holds the final AQE state
      val qe = joined.queryExecution
      qe.toRdd.count()
      val finalPlan = qe.executedPlan.toString()
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-split markers:\n${finalPlan.take(4000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salt column does not leak into the result") {
    val big = Seq(("a", 1)).toDF("k", "v")
    val small = Seq(("a", "x")).toDF("k", "w")
    assert(Joins.saltedJoin(big, small, "k", 4).columns.toSeq == Seq("k", "v", "w"))
  }
}
