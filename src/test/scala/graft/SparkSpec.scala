package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (getOrCreate — one JVM-wide
  * session; never stopped so suites can share it). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // the status store retains 1000 executions / jobs / stages by
    // default even with the UI off — across 25 suites sharing this
    // session that's heap + listener-bus drag on every later suite
    .config("spark.sql.ui.retainedExecutions", "8")
    .config("spark.ui.retainedJobs", "50")
    .config("spark.ui.retainedStages", "50")
    .config("spark.ui.retainedTasks", "500")
    .getOrCreate()
}
