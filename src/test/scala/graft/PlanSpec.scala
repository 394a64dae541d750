package graft

/** Pins the physical-plan properties behind the SURVEY §4 claims —
  * a refactor that un-pushes a filter or de-broadcasts a dimension
  * fails here, not in a 100 TB deployment. (PLANS.md carries the full
  * generated excerpts; these are the load-bearing assertions.) */
class PlanSpec extends SparkTestBase {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)

  test("q6_forecast: every predicate reaches the parquet scan") {
    val p = planOf("q6_forecast")
    assert(p.contains("PushedFilters"), p.take(800))
    assert(p.contains("GreaterThanOrEqual(l_discount"), "discount bound not pushed")
    assert(p.contains("LessThan(l_quantity"), "quantity bound not pushed")
  }

  test("knn_filtered: metadata filter pushed beneath the custom operator") {
    val p = planOf("knn_filtered")
    assert(p.contains("LessThan(label,5)"), s"label filter not pushed:\n${p.take(1200)}")
  }

  test("q3/q5: dimension tables broadcast, never shuffled") {
    assert(planOf("q3_revenue_topn").contains("BroadcastHashJoin"))
    assert(planOf("q5_nation_revenue").contains("BroadcastHashJoin"))
  }

  test("q1_pricing: map-side partial aggregation before the exchange") {
    val p = planOf("q1_pricing")
    assert(p.contains("partial_"), s"no partial aggregate:\n${p.take(1200)}")
  }

  test("text_tfidf: document-frequency side broadcast") {
    assert(planOf("text_tfidf").contains("BroadcastHashJoin"))
  }
}
