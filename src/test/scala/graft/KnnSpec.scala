package graft

import org.apache.spark.sql.functions._
import graft.operators.{Knn, VectorSearch}

class KnnSpec extends SparkTestBase {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sfDir, "embeddings")
  lazy val queries = emb.filter(col("vec_id") < 3)

  def bruteForce(metric: Knn.Metric): Map[(Long, Int), Long] = {
    val all = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val qs = all.filter(_._1 < 3)
    (for ((qid, qv) <- qs) yield {
      val scored = all.map { case (id, v) =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < v.length) {
          val x = v(i).toDouble; val y = qv(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val s = metric match {
          case Knn.Cosine => dot / (math.sqrt(na) * math.sqrt(nb))
          case Knn.L2 =>
            var ss = 0.0; var j = 0
            while (j < v.length) { val d = v(j).toDouble - qv(j).toDouble; ss += d * d; j += 1 }
            1.0 / (1.0 + ss)
          case Knn.Ip => dot
        }
        (id, s)
      }
      val top = scored.sortBy { case (id, s) => (-s, id) }.take(5)
      top.zipWithIndex.map { case ((id, _), r) => (qid, r + 1) -> id }
    }).flatten.toMap
  }

  for (m <- Seq(Knn.Cosine, Knn.L2, Knn.Ip)) {
    test(s"topK($m) matches in-memory brute force") {
      val got = Knn.topK(emb, queries, 5, m)
        .select($"qid", $"rank", $"vec_id").as[(Long, Int, Long)].collect()
        .map { case (q, r, id) => (q, r) -> id }.toMap
      assert(got == bruteForce(m))
    }
  }

  test("rank 1 is the query itself at similarity 1 (cosine)") {
    val top1 = Knn.topK(emb, queries, 3, Knn.Cosine).filter($"rank" === 1)
      .select($"qid", $"vec_id", $"score").as[(Long, Long, Double)].collect()
    top1.foreach { case (q, id, s) =>
      assert(q == id); assert(math.abs(s - 1.0) < 1e-12)
    }
  }

  test("filtered corpus never returns excluded rows") {
    val res = Knn.topK(emb.filter($"label" < 5), queries, 5, Knn.Cosine)
      .join(emb.select($"vec_id", $"label"), "vec_id")
    assert(res.filter($"label" >= 5).count() == 0)
  }

  test("deterministic across runs") {
    val r1 = Knn.topK(emb, queries, 5, Knn.Cosine).collect().toSeq
    val r2 = Knn.topK(emb, queries, 5, Knn.Cosine).collect().toSeq
    assert(r1 == r2)
  }
}
