package graft.ops

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"compact_$tag").resolve("t").toString

  test("coalesce mode: rows preserved, file count tracks the byte target") {
    val in = freshDir("in")
    (0 until 2000).map(i => (i.toLong, s"payload_$i"))
      .toDF("id", "v").repartition(40).write.parquet(in)
    val before = Compaction.dirStats(spark, in)
    assert(before.files == 40)

    val out = freshDir("out")
    // target = ~quarter of the input bytes -> expect ~4 files, not 40
    val after = Compaction.compact(spark, in, out,
      targetFileBytes = math.max(1, before.bytes / 4))
    assert(after.files <= 6 && after.files >= 2, after.toString)
    val a = spark.read.parquet(in).as[(Long, String)].collect().sorted.toSeq
    val b = spark.read.parquet(out).as[(Long, String)].collect().sorted.toSeq
    assert(a == b)
  }

  test("clusterBy mode: files hold disjoint key ranges (zone-map layout)") {
    val in = freshDir("cin")
    (0 until 3000).map(i => ((i * 7919L) % 3000, i.toLong))
      .toDF("k", "v").repartition(25).write.parquet(in)
    val out = freshDir("cout")
    val st = Compaction.dirStats(spark, in)
    Compaction.compact(spark, in, out,
      targetFileBytes = math.max(1, st.bytes / 5), clusterBy = Seq("k"))
    // per-file [min, max] of k must not overlap across files
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length >= 2, "fixture must produce multiple files")
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._3 < b._2,
        s"overlapping ranges: ${a._1}[${a._2},${a._3}] vs ${b._1}[${b._2},${b._3}]")
      case _ =>
    }
    // rows preserved
    assert(spark.read.parquet(out).count() == 3000)
  }

  test("refuses to clobber an existing output dir (snapshot discipline)") {
    val in = freshDir("ein")
    Seq((1L, "a")).toDF("id", "v").write.parquet(in)
    val out = freshDir("eout")
    Compaction.compact(spark, in, out, targetFileBytes = 1L << 20)
    intercept[Exception] {
      Compaction.compact(spark, in, out, targetFileBytes = 1L << 20)
    }
  }
}
