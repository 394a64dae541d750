package graft

import org.apache.spark.sql.functions._
import graft.operators.Knn
import graft.plans.VectorTopK

/** The custom-SparkPlan kNN must agree exactly with the mapPartitions
  * operator, and show up as a physical node. */
class VectorTopKPlanSpec extends SparkTestBase {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sfDir, "embeddings")
  lazy val queries = emb.filter(col("vec_id") < 5)

  for (m <- Seq(Knn.Cosine, Knn.L2, Knn.Ip)) {
    test(s"planned topK($m) equals the independent mapPartitions formulation") {
      val a = VectorTopK.topK(emb, queries, 7, m)
        .select($"qid", $"rank", $"vec_id", $"score")
        .as[(Long, Int, Long, Double)].collect().toSeq
      val b = Knn.topKMapPartitions(emb, queries, 7, m)
        .select($"qid", $"rank", $"vec_id", $"score")
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(a == b)
    }
  }

  test("physical plan contains VectorTopKExec over the pruned scan") {
    val df = VectorTopK.topK(emb.filter(col("label") < 5), queries, 3)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("VectorTopK"), plan)
    // filter still pushed beneath the custom node
    assert(plan.contains("PushedFilters") && plan.contains("label"), plan)
  }
}
