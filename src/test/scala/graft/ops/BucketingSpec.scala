package graft.ops

import java.nio.file.Files
import graft.SparkSpec

/** Bucketed co-located join: the join plan must contain NO shuffle
  * exchange — the layout did the partitioning once at write time. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("equally-bucketed tables join without a shuffle") {
    val base = Files.createTempDirectory("buckets")
    val trips = (1 to 1000).map(i => (s"t$i", s"r${i % 20}")).toDF("trip_id", "route_id")
    val stopTimes = (1 to 1000).flatMap(i =>
      (1 to 3).map(j => (s"t$i", j, s"s$j"))).toDF("trip_id", "stop_sequence", "stop_id")
    try {
      Bucketing.writeBucketed(trips, "bk_trips",
        base.resolve("trips").toString, "trip_id", 4)
      Bucketing.writeBucketed(stopTimes, "bk_stop_times",
        base.resolve("st").toString, "trip_id", 4)

      // disable auto-broadcast so the planner keeps the bucketed
      // sort-merge path (at real scale both sides exceed the threshold)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = Bucketing.bucketJoin(spark, "bk_stop_times", "bk_trips", "trip_id")
        val plan = joined.queryExecution.executedPlan.toString()
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle:\n$plan")
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        assert(joined.count() == 3000)

        // contrast: the same join over plain parquet DOES shuffle
        val plainL = spark.read.parquet(base.resolve("st").toString)
        val plainR = spark.read.parquet(base.resolve("trips").toString)
        val plainPlan = plainL.join(plainR, "trip_id")
          .queryExecution.executedPlan.toString()
        assert(plainPlan.contains("Exchange"),
          s"plain join should need a shuffle:\n$plainPlan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_trips")
      spark.sql("DROP TABLE IF EXISTS bk_stop_times")
    }
  }
}
