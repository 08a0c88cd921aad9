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

    val streaming = OrderedDigest.perKeyDigest(df, "k", Seq("seq"), col("v"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap

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

  test("multi-column sort order, custom separator, truncation, numeric key") {
    // keys stay LONG through the digest (c16's min-id election needs
    // numeric order); sort is (s1, s2) with ties broken by s2
    val df = Seq(
      (10L, 2L, 1L, "b"), (10L, 1L, 2L, "a"), (10L, 1L, 1L, "c"),
      (9L, 1L, 1L, "z")).toDF("k", "s1", "s2", "v")
    val got = OrderedDigest.perKeyDigest(df, "k", Seq("s1", "s2"), col("v"),
        sep = "|", takeChars = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    val want = df
      .groupBy("k")
      .agg(substring(sha2(array_join(transform(
        array_sort(collect_list(struct(col("s1"), col("s2"), col("v")))),
        x => x.getField("v")), "|"), 256), 1, 8).as("digest"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got == want)
    assert(got.keySet == Set(9L, 10L)) // long keys survive round-trip
  }

  test("one hot key with 200k rows streams through (bounded state)") {
    // A single unbounded-size group is exactly the case the
    // collect_list form materializes; here it must stream. The digest
    // is checked against a driver-side incremental fold of the same
    // ordered values — no executor-side group array anywhere.
    val n = 200000
    val df = (0 until n).map(i => ("hot", i.toLong, s"v$i"))
      .toDF("k", "seq", "v").repartition(8)
    val got = OrderedDigest.perKeyDigest(df, "k", Seq("seq"), col("v"))
      .collect()
    assert(got.length == 1 && got(0).getLong(2) == n.toLong)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    (0 until n).foreach { i =>
      if (i > 0) md.update(' '.toByte)
      md.update(s"v$i".getBytes("UTF-8"))
    }
    val want = md.digest().map(b => f"$b%02x").mkString
    assert(got(0).getString(1) == want)
  }

  test("single-row keys and empty partitions are handled") {
    val df = Seq(("a", 1L, "x"), ("b", 1L, "y")).toDF("k", "seq", "v")
      .repartition(16) // most partitions empty after keying
    val out = OrderedDigest.perKeyDigest(df, "k", Seq("seq"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("a" -> 1L, "b" -> 1L))
  }
}
