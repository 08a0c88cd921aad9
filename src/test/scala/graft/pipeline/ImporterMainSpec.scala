package graft.pipeline

import graft.meta.SuccessfulImport
import org.scalatest.funsuite.AnyFunSuite

/** The K6 result line must stay machine-parseable JSON whatever the
  * configured db prefix carries — db names interpolate into it, and a
  * quote/backslash/control char in GTFS_IMPORTER_DB_PREFIX previously
  * emitted invalid JSON (r15 VERDICT #5). Parsed back with json4s
  * (ships with Spark) so "valid" means a real parser accepts it. */
class ImporterMainSpec extends AnyFunSuite {
  import org.json4s._
  import org.json4s.jackson.JsonMethods.parse

  private val hostile = """gtfs"2024\na	b_1700000000"""

  test("K6 JSON survives a hostile db prefix (quote, backslash, tab)") {
    val r = Import.Result(
      downloadDurationMs = 12L,
      deletedDatabases = Seq(hostile + "_old", "plain_db"),
      retainedDatabases = Seq(hostile),
      importSkipped = false,
      newImport = Some(SuccessfulImport(hostile, 1700000000L, "abc123")),
      importDurationMs = 345L)
    val j = parse(ImporterMain.resultJson(r))
    assert((j \ "newDb") == JString(hostile))
    assert((j \ "importSkipped") == JBool(false))
    assert((j \ "deletedDatabases") ==
      JArray(List(JString(hostile + "_old"), JString("plain_db"))))
    assert((j \ "retainedDatabases") == JArray(List(JString(hostile))))
    assert((j \ "downloadDurationMs") == JInt(12))
    assert((j \ "importDurationMs") == JInt(345))
  }

  test("K6 JSON renders the skipped shape with nulls and empty lists") {
    val r = Import.Result(7L, Nil, Seq("kept_1"), importSkipped = true,
      newImport = None, importDurationMs = 0L)
    val j = parse(ImporterMain.resultJson(r))
    assert((j \ "importSkipped") == JBool(true))
    assert((j \ "newDb") == JNull)
    assert((j \ "deletedDatabases") == JArray(Nil))
  }
}
