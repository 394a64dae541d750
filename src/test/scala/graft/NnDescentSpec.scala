package graft

import org.apache.spark.sql.functions._
import graft.operators.{Knn, NnDescent}

/** NN-Descent converges toward the exact k-NN graph. */
class NnDescentSpec extends SparkTestBase {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sfDir, "embeddings")
  lazy val exact: Map[Long, Set[Long]] =
    Knn.topK(emb, emb, NnDescent.K + 1, Knn.Cosine)
      .filter($"qid" =!= $"vec_id")
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet.take(NnDescent.K)).toMap

  def recallOf(g: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, ex) =>
      g.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    per.sum / per.size
  }

  def graphOf(rounds: Int): Map[Long, Set[Long]] =
    NnDescent.build(emb, rounds = rounds)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("neighbor-of-neighbor rounds improve recall; converged graph is accurate") {
    val r0 = recallOf(graphOf(0))
    val r3 = recallOf(graphOf(NnDescent.Rounds))
    assert(r3 > r0, s"rounds did not improve recall: $r0 -> $r3")
    assert(r3 >= 0.8, s"converged recall $r3 too low (init was $r0)")
  }
}
