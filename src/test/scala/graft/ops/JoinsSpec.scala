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

  test("salt column does not leak into the result") {
    val big = Seq(("a", 1)).toDF("k", "v")
    val small = Seq(("a", "x")).toDF("k", "w")
    assert(Joins.saltedJoin(big, small, "k", 4).columns.toSeq == Seq("k", "v", "w"))
  }
}
