package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The winnowing guarantee (Schleimer et al. 2003): two documents that
  * share a run of >= k + window - 1 tokens (k = 3-token shingles,
  * window = 4 → 6 tokens) share at least one fingerprint, and the
  * sketch is a strict subset of the full shingle-hash set. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def toksDf(rows: (Long, Seq[String])*) =
    rows.toDF("doc_id", "toks")

  test("docs sharing a >= 6-token run share a fingerprint") {
    val shared = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta")
    val a = Seq("one", "two", "three") ++ shared ++ Seq("x", "y")
    val b = Seq("p", "q", "r", "s", "t") ++ shared // different offset
    val fps = Winnow.fingerprints(toksDf(1L -> a, 2L -> b), window = 4)
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty,
      s"no shared fingerprint: ${fps(1L)} vs ${fps(2L)}")
  }

  test("unrelated docs share no fingerprint") {
    val a = (1 to 20).map(i => s"a$i")
    val b = (1 to 20).map(i => s"b$i")
    val fps = Winnow.fingerprints(toksDf(1L -> a, 2L -> b), window = 4)
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).isEmpty)
  }

  test("sketch is smaller than the full shingle set and deterministic") {
    val toks = (1 to 60).map(i => s"w${i % 17}") // repeating vocabulary
    val df = toksDf(1L -> toks)
    val r1 = Winnow.fingerprints(df, window = 4).as[(Long, Seq[Long])].collect()
    val r2 = Winnow.fingerprints(df, window = 4).as[(Long, Seq[Long])].collect()
    assert(r1.toSeq == r2.toSeq, "fingerprints must be deterministic")
    val nShingles = toks.length - 2
    assert(r1.head._2.length < nShingles,
      s"sketch (${r1.head._2.length}) should be smaller than $nShingles shingles")
    assert(r1.head._2 == r1.head._2.sorted, "fps array must be sorted")
  }
}
