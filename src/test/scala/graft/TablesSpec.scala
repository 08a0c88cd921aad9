package graft

/** The relation cache's advertised lifecycle: same DataFrame reference
  * until invalidate(), fresh relation afterwards (the documented recipe
  * for a rewritten data dir or a closing session). */
class TablesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("load caches per (session, dir, table) and invalidate() clears") {
    val a = Tables.nation(spark, dir)
    assert(Tables.nation(spark, dir) eq a, "second load must hit the cache")
    Tables.invalidate()
    assert(Tables.nation(spark, dir) ne a, "invalidate() must drop the entry")
  }

  test("invalidate(session) only clears that session's entries") {
    val a = Tables.nation(spark, dir)
    val other = spark.newSession()
    val b = Tables.nation(other, dir)
    Tables.invalidate(other)
    assert(Tables.nation(spark, dir) eq a, "other-session invalidate must not evict")
    assert(Tables.nation(other, dir) ne b)
  }
}
