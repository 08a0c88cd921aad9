package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused [[PiiScrubExpr]] must match the six-expression composable
  * form it replaced (3× regexp_extract_all for counts on the original
  * text + 3 nested regexp_replace for the sequential mask) — kept HERE
  * verbatim as the executable spec, run on real corpus text with the
  * same synthetic PII the llm_pii_redact oracle appends, plus
  * adversarial edges (adjacent/overlapping candidates, pattern at
  * string edges, no matches, empty string). */
class PiiScrubSpec extends SparkSpec {

  private val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val phonePat = "\\b555-\\d{4}\\b"

  private def composable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("t"), lit(emailPat), lit(0))).cast("long").as("n_email"),
      size(regexp_extract_all(col("t"), lit(ipPat), lit(0))).cast("long").as("n_ip"),
      size(regexp_extract_all(col("t"), lit(phonePat), lit(0))).cast("long").as("n_phone"),
      regexp_replace(regexp_replace(regexp_replace(col("t"),
        lit(emailPat), lit("<EMAIL>")), lit(ipPat), lit("<IP>")),
        lit(phonePat), lit("<PHONE>")).as("redacted"))

  private def fused(docs: DataFrame): DataFrame = {
    PiiScrub.register(docs.sparkSession, emailPat, ipPat, phonePat)
    docs.select(col("doc_id"), expr("pii_scrub(t)").as("st"))
      .select(col("doc_id"), col("st.n_email").as("n_email"),
        col("st.n_ip").as("n_ip"), col("st.n_phone").as("n_phone"),
        col("st.redacted").as("redacted"))
  }

  private def assertIdentical(docs: DataFrame): Unit = {
    val f = fused(docs)
    val c = composable(docs)
    assert(f.exceptAll(c).isEmpty && c.exceptAll(f).isEmpty,
      s"fused != composable:\n fused ${f.orderBy("doc_id").collect().toSeq}" +
        s"\n comp  ${c.orderBy("doc_id").collect().toSeq}")
  }

  test("identical on real corpus text with the oracle's synthetic PII") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(500)
      .select(col("doc_id"), concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com from 10.20."),
        col("doc_id") % 256, lit(".7 call 555-"), (col("doc_id") % 9000) + 1000,
        when(col("doc_id") % 3 === 0, lit(" cc admin@example.org"))
          .otherwise(lit(""))).as("t"))
    assertIdentical(docs)
  }

  test("identical on adversarial edges") {
    import spark.implicits._
    assertIdentical(Seq(
      "",                                      // empty
      "no pii here at all",                    // zero matches
      "a@b.co",                                // whole string is one match
      "1.2.3.4",                               // ip at both edges
      "555-1234",                              // phone at both edges
      "x 555-12345 y",                         // \b rejects the 5-digit run
      "ip 999.999.999.999 still matches",      // class allows 3 digits
      "1.2.3.4.5.6.7.8",                       // overlapping candidates
      "a@b.com c@d.org e@f.io",                // several emails
      "mail 1.2.3.4user@example.com tail",     // ip abutting an email:
                                               // email consumes the local
                                               // part; the count-on-original
                                               // vs mask-sequential split is
                                               // exactly what this pins
      "call 555-0000 at 10.0.0.1 for x@y.zz")  // all three categories
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "t"))
  }

  test("the fused plan is map-only (no exchange)") {
    import spark.implicits._
    val docs = Seq((1L, "a@b.com 1.2.3.4 555-0000")).toDF("doc_id", "t")
    val plan = fused(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }
}
