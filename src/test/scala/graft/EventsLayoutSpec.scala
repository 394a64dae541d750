package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Time-partitioned at-rest layout for the events fact table — at
  * 100 TB the only queries that stay cheap are the ones whose time
  * predicate prunes files before any IO. Day is derived from the ns
  * clock with exact integer arithmetic (the same `div` discipline as
  * the retention/tumbling queries). */
class EventsLayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("day-partitioned events: time filters prune partitions; results unchanged") {
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("day", expr("ts div 86400000000000"))
    val dir = Files.createTempDirectory("graft_events").toString
    ev.write.partitionBy("day").mode("overwrite").parquet(dir)

    val loaded = spark.read.parquet(dir)
    assert(loaded.count() == ev.count())

    val days = ev.select($"day").distinct().as[Long].collect().sorted
    val (d0, d1) = (days.head, days(math.min(2, days.length - 1)))
    val ranged = loaded.filter($"day".between(d0, d1))
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"),
      s"no partition pruning:\n${plan.take(1500)}")

    // pruned read computes the same aggregate as the unpartitioned scan
    val a = ranged.groupBy($"event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val b = ev.filter($"day".between(d0, d1))
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }
}
