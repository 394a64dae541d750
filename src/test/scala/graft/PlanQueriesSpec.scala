package graft

import graft.operators.PlanQueries

/** Plan properties of the graded plan-path queries (the row-level
  * results are held to the DuckDB oracle by the driver gate). */
class PlanQueriesSpec extends SparkTestBase {

  test("graded bucketed join executes without a shuffle exchange") {
    val n = PlanQueries.qBucketedJoin(spark, sfDir).count()
    assert(n > 0)
    assert(!PlanQueries.lastBucketedPlan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${PlanQueries.lastBucketedPlan.take(2000)}")
    assert(PlanQueries.lastBucketedPlan.contains("SortMergeJoin"),
      PlanQueries.lastBucketedPlan.take(500))
  }

  test("graded skew join executes adaptively with skew handling forced") {
    val df = PlanQueries.qSkewJoin(spark, sfDir)
    assert(df.count() == 5) // one row per event type
    assert(PlanQueries.lastSkewPlan.contains("AdaptiveSparkPlan"),
      PlanQueries.lastSkewPlan.take(500))
  }
}
