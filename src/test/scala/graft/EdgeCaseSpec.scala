package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Knn}
import graft.plans.GraftRules

class EdgeCaseSpec extends SparkTestBase {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("kNN with empty corpus returns no rows") {
    val empty = emb.filter($"vec_id" < 0)
    assert(Knn.topK(empty, emb.filter($"vec_id" < 3), 5).count() == 0)
  }

  test("kNN with empty query set returns no rows") {
    assert(Knn.topK(emb, emb.filter($"vec_id" < 0), 5).count() == 0)
  }

  test("kNN with k larger than corpus returns the whole corpus ranked") {
    val tiny = emb.filter($"vec_id" < 4)
    val res = Knn.topK(tiny, tiny.filter($"vec_id" === 0), 100)
    assert(res.count() == 4)
    assert(res.agg(max($"rank")).head.getInt(0) == 4)
  }

  test("minhash dedup on a single-doc corpus yields no pairs") {
    val one = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    assert(Dedup.minhashNearDups(one, "doc_id", "text").count() == 0)
  }

  test("connected components of an empty pair set is empty") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
  }

  test("fp16 idempotence rule collapses nested rounds in the optimized plan") {
    GraftRules.install(spark)
    import graft.functions.VectorOps
    val df = emb.select(VectorOps.fp16(VectorOps.fp16($"embedding")).as("v"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("fp16roundarr".r.findAllIn(optimized.toLowerCase).size == 1, optimized)
    // and results equal the single application
    val single = emb.select(VectorOps.fp16($"embedding").as("v"))
    assert(df.collect().map(_.getSeq[Float](0)).toSeq ==
      single.collect().map(_.getSeq[Float](0)).toSeq)
  }
}
