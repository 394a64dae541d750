package graft

import org.apache.spark.sql.functions._

/** Co-located join via bucketed tables: both sides bucketed by the
  * join key → SortMergeJoin without a shuffle Exchange on either side.
  * At 100 TB this is the difference between re-shuffling the fact
  * table per join and reading pre-placed buckets.
  */
class BucketedJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed lineitem ⋈ orders plans without a shuffle exchange") {
    // default warehouse (./spark-warehouse, gitignored); tables dropped below
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_b")
      Tables.load(spark, sfDir, "orders")
        .select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_b")

      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // result correctness vs the plain join
      val plain = Tables.load(spark, sfDir, "lineitem")
        .join(Tables.load(spark, sfDir, "orders"), $"l_orderkey" === $"o_orderkey")
        .count()
      assert(joined.count() == plain)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
