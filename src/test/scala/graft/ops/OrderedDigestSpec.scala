package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming per-key digest equals the collect_list formulation and
  * never materializes a group. */
class OrderedDigestSpec extends SparkSpec {
  import spark.implicits._

  test("matches the collect_list digest on multi-partition random data") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 5000).map { i =>
      (s"k${rnd.nextInt(20)}", i.toLong, s"v${rnd.nextInt(1000)}")
    }
    val df = rows.toDF("k", "seq", "v").repartition(8)

    val streaming = OrderedDigest.perKeyDigest(df, "k", "seq", "v")
      .collect().map(d => d.key -> ((d.digest, d.n))).toMap

    val collected = df
      .groupBy("k")
      .agg(
        sha2(array_join(transform(
          array_sort(collect_list(struct(col("seq"), col("v")))),
          x => x.getField("v")), " "), 256).as("digest"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap

    assert(streaming.keySet == collected.keySet)
    streaming.foreach { case (k, (dg, n)) =>
      assert(collected(k) == ((dg, n)), s"mismatch for $k")
    }
  }

  test("single-row keys and empty partitions are handled") {
    val df = Seq(("a", 1L, "x"), ("b", 1L, "y")).toDF("k", "seq", "v")
      .repartition(16) // most partitions empty after keying
    val out = OrderedDigest.perKeyDigest(df, "k", "seq", "v")
      .collect().map(d => d.key -> d.n).toMap
    assert(out == Map("a" -> 1L, "b" -> 1L))
  }
}
