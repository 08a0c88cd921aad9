package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Proves the `spark.sql.extensions` injection path end-to-end: a
  * session built with GraftExtensions resolves every custom expression
  * from plain SQL, no register() calls. The suite's shared session is
  * saved and restored around the extension-enabled one (which reuses
  * the same SparkContext — extensions apply per-SparkSession). */
class ExtensionsSpec extends AnyFunSuite {

  test("extension-enabled session resolves all custom functions from SQL") {
    // ensure a context exists (shared across suites)
    val shared = SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions: the spark.sql.extensions STRING is a static conf
      // read from the SparkContext, which this suite must reuse — the
      // injection logic under test (GraftExtensions.apply) is identical
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne shared, "a fresh session must be created for extensions")
      assert(s.sql("SELECT gtfs_secs('25:30:00') AS v").head().getLong(0)
        == 25L * 3600 + 30 * 60)
      assert(s.sql(
        "SELECT dot_scaled(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS v")
        .head().getLong(0) == 11L * 1000000000000L)
      assert(s.sql(
        "SELECT l2_sq(array(1.0D, 2.0D), array(1.0D, 4.0D)) AS v")
        .head().getDouble(0) == 4.0)
      assert(s.sql(
        "SELECT size(ngram_hashes(split('a b c d', ' '), 2)) AS v")
        .head().getInt(0) == 3)
      assert(s.sql(
        "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 5L, 7L)) AS v")
        .head().getInt(0) == 2)
      // wrong arity → clear message, not a Catalyst internal error
      val e = intercept[Exception] { s.sql("SELECT l2_sq(array(1.0D))").collect() }
      assert(e.getMessage.contains("l2_sq expects 2"), e.getMessage)
      // non-literal n → clear usage message
      val e2 = intercept[Exception] {
        s.sql("SELECT ngram_hashes(split('a b', ' '), CAST(rand()*2 AS INT))").collect()
      }
      assert(e2.getMessage.contains("ngram_hashes"), e2.getMessage)
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
