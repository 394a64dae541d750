package graft

import org.apache.spark.sql.functions._

/** DSv2 vector-corpus source: deterministic values, filter pushdown
  * narrows the generated range, column pruning skips vector synthesis. */
class VectorGenSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def gen(n: Long, dim: Int = 8) =
    spark.read.format("graft.sources.VectorGen")
      .option("n", n).option("dim", dim).option("partitions", 4).load()

  test("deterministic generation matching the published formula") {
    val df = gen(100)
    assert(df.count() == 100)
    val row = df.filter($"vec_id" === 7)
      .select($"embedding", $"label").head
    val emb = row.getSeq[Float](0)
    assert(row.getInt(1) == 7)
    assert(emb.length == 8)
    assert(emb(3) == graft.sources.VectorGen.component(7L, 8, 3))
    // same read twice → identical rows
    assert(gen(100).collect().map(_.toSeq).toSeq == df.collect().map(_.toSeq).toSeq)
  }

  test("vec_id range filters push into the source (range narrowed before generation)") {
    val df = gen(1000000).filter($"vec_id" >= 10 && $"vec_id" < 20)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[10,20)"), s"range not narrowed:\n${plan.take(1200)}")
    assert(df.count() == 10)
  }

  test("column pruning reaches the source (id-only scan reads no vectors)") {
    val df = gen(1000).select($"vec_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=vec_id"), s"columns not pruned:\n${plan.take(1200)}")
    assert(df.count() == 1000)
  }

  test("the generated corpus flows into the kNN operator") {
    val corpus = gen(500, dim = 16)
    val res = operators.Knn.topK(corpus, corpus.filter($"vec_id" < 3), 5)
    val top = res.filter($"rank" === 1).select($"qid", $"vec_id")
      .as[(Long, Long)].collect()
    top.foreach { case (q, v) => assert(q == v) } // self-match at rank 1
  }
}
