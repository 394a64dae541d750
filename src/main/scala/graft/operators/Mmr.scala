package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.Tables

/** Maximal Marginal Relevance diversity reranking (reference:
  * src/retrieval/reranker.py:52-117): greedy selection maximizing
  * λ·rel(i) − (1−λ)·max_{j∈S} sim(i,j).
  *
  * Distribution shape: candidates per query are tiny (top-N from the
  * ANN stage), so the greedy loop runs inside mapGroups per query —
  * queries parallelize across the cluster, candidates never shuffle
  * more than once. Ties resolve to the earlier original rank, matching
  * the reference's np.argmax first-index semantics (reranker.py:110).
  */
object Mmr {
  val Lambda = 0.5
  val CandidateK = 20
  val SelectK = 10

  def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb) + 1e-8) // reranker.py:138 epsilon
  }

  /** Greedy MMR over (id, relevance, vector) candidates (rank order). */
  def select(cands: Array[(Long, Double, Array[Double])], k: Int,
             lambda: Double): Array[(Long, Double)] = {
    val n = cands.length
    if (n == 0) return Array.empty
    val selected = scala.collection.mutable.ArrayBuffer[Int]()
    val remaining = scala.collection.mutable.ArrayBuffer.range(0, n)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    while (remaining.nonEmpty && selected.length < k) {
      val pick =
        if (selected.isEmpty) remaining.head // reranker.py:87 first = top-ranked
        else {
          var bestIdx = remaining.head; var bestScore = Double.NegativeInfinity
          remaining.foreach { i =>
            val rel = cands(i)._2
            var maxSim = Double.NegativeInfinity
            selected.foreach { s =>
              val sim = cos(cands(i)._3, cands(s)._3)
              if (sim > maxSim) maxSim = sim
            }
            val mmr = lambda * rel - (1 - lambda) * maxSim
            if (mmr > bestScore) { bestScore = mmr; bestIdx = i } // strict > keeps first on tie
          }
          bestIdx
        }
      val mmrScore =
        if (selected.isEmpty) lambda * cands(pick)._2
        else {
          var maxSim = Double.NegativeInfinity
          selected.foreach { s =>
            val sim = cos(cands(pick)._3, cands(s)._3)
            if (sim > maxSim) maxSim = sim
          }
          lambda * cands(pick)._2 - (1 - lambda) * maxSim
        }
      selected += pick
      remaining -= pick
      out += ((cands(pick)._1, mmrScore))
    }
    out.toArray
  }

  def rerank(corpus: DataFrame, queries: DataFrame,
             candidateK: Int = CandidateK, selectK: Int = SelectK,
             lambda: Double = Lambda): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cands = Knn.topK(corpus, queries, candidateK, Knn.Cosine)
      .join(corpus.select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("emb")),
        "vec_id")
      .select(col("qid"), col("vec_id"), col("score"), col("rank"), col("emb"))
      .as[(Long, Long, Double, Int, Seq[Double])]
    cands.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val sorted = it.toArray.sortBy(_._4) // original rank order
        val arr = sorted.map(t => (t._2, t._3, t._5.toArray))
        select(arr, selectK, lambda).zipWithIndex.map { case ((id, s), i) =>
          (qid, id, i + 1, s)
        }.iterator
      }
      .toDF("qid", "vec_id", "mmr_rank", "mmr_score")
      .orderBy("qid", "mmr_rank")
  }

  def mmrRerank(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    rerank(emb, emb.filter(col("vec_id") < VectorSearch.NQueries))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("mmr_rerank" -> (mmrRerank _))
  val oracles: Map[String, String] = Map.empty // iterative → spec'd in MmrSpec
}
