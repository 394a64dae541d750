package graft

import org.apache.spark.sql.functions._

/** AQE runtime skew handling — the third skew tool alongside manual
  * salting (Dedup.dedupEmbeddingSalted) and bucket caps
  * (Dedup.MaxBucketSize): Spark's adaptive executor detects oversized
  * shuffle partitions from RUNTIME stats and splits them, with no
  * query rewrite. This spec pins the behavior so the 100 TB posture
  * ("AQE skew-join on, salting only for non-join skew") stays true. */
class AqeSkewSpec extends SparkTestBase {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // the join feeds an aggregate keyed the same way, so splitting
      // skewed partitions costs one extra shuffle — force accepts that
      // trade (the knob a 100 TB deployment sets when join skew
      // dominates the extra exchange)
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")

      // one pathological key (996, disjoint from id%995 ∈ [0,994])
      // owns 25% of the fact side
      val left = spark.range(0, 400000)
        .select(when($"id" % 4 =!= 0, $"id" % 995).otherwise(lit(996L)).as("k"),
          $"id".as("v"))
      val right = spark.range(0, 997).select($"id".as("k"), ($"id" * 2).as("w"))
      val j = left.join(right, "k").groupBy("k").agg(count(lit(1)).as("n"))

      // correctness unaffected by the split
      val rows = j.collect().map(r => (r.getLong(0), r.getLong(1)))
      val hot = rows.find(_._1 == 996L).get
      assert(hot._2 == 100000L, s"hot key count ${hot._2}")

      val planStr = j.queryExecution.executedPlan.toString
      assert(planStr.contains("skew=true") || planStr.contains("isSkewJoin=true"),
        s"no skew split in final adaptive plan:\n${planStr.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
