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

  /** The reference's `strategy='combined'` rerank (reranker.py:119-135)
    * is literally its MMR rerank pinned at λ=0.7; here the candidate
    * pool is the hybrid dense+sparse top-K (the fused list both
    * retrieval families feed), relevance = the rrf score, and the
    * greedy diversity loop is the SAME select() as mmr_rerank. Pool
    * rows whose id has no embedding drop before the loop (inner join)
    * on both engines. */
  val CombinedLambda = 0.7

  def mmrCombined(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    val cands = Bm25.hybridRrf(s, dir)
      .select(col("qid"), col("id").as("vec_id"), col("rrf"), col("rank"))
      .join(emb.select(col("vec_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("emb")), "vec_id")
      .select(col("qid"), col("vec_id"), col("rrf"), col("rank"), col("emb"))
      .as[(Long, Long, Double, Int, Seq[Double])]
    cands.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val sorted = it.toArray.sortBy(_._4) // hybrid rank order
        val arr = sorted.map(t => (t._2, t._3, t._5.toArray))
        select(arr, SelectK, CombinedLambda).zipWithIndex.map { case ((id, sc), i) =>
          (qid, id, i + 1, sc)
        }.iterator
      }
      .toDF("qid", "vec_id", "mmr_rank", "mmr_score")
      .orderBy("qid", "mmr_rank")
  }

  /** Bit-exact SQL twin of the greedy loop, UNROLLED: selection step t
    * is a CTE that anti-joins the already-selected set (s1..s_{t-1}),
    * scores λ·rel − (1−λ)·max(sim to selected), and keeps the
    * row_number()=1 winner under (mmr DESC, original rank ASC) — the
    * same first-index-on-tie rule as the strict `>` in select().
    * λ = 0.5 is exactly representable, the pairwise cosine carries the
    * reference's 1e-8 epsilon, and every reduction is the standard
    * unrolled left-assoc double sum. MATERIALIZED hints stop DuckDB
    * from re-inlining the shared CTEs once per unrolled step. */
  /** The pairwise-sim CTE over `cand` (expects a `nrm` CTE of per-id
    * norms to exist; carries the reference's 1e-8 epsilon). */
  private[operators] def pairCte: String = {
    import graft.OracleSql
    s"""pair AS MATERIALIZED (
       |  SELECT a.qid, a.vec_id AS ia, b.vec_id AS ib,
       |    ${OracleSql.dot("ea.embedding", "eb.embedding")} / (na.nm * nb.nm + 1.0e-8) AS sim
       |  FROM cand a JOIN cand b ON a.qid = b.qid
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id
       |  JOIN nrm na ON na.vec_id = a.vec_id
       |  JOIN nrm nb ON nb.vec_id = b.vec_id)""".stripMargin
  }

  /** The greedy loop UNROLLED over `cand`/`pair` CTEs, parameterized by
    * the λ literals (passed as SQL text so the engine folds exactly the
    * doubles Scala computes: for λ=0.5 both factors are the exact
    * 0.5e0; for λ=0.7 the second factor must be written (1.0e0 - 0.7e0)
    * to reproduce Scala's 1 - 0.7 rounding). Appends s1..sK and the
    * final union select. */
  private[operators] def greedyUnroll(lam: String, oneMinus: String): String = {
    val sb = new StringBuilder
    sb.append(
      s""",
         |s1 AS MATERIALIZED (SELECT qid, vec_id, rnk, $lam * rel AS mmr_score
         |  FROM cand WHERE rnk = 1)""".stripMargin)
    for (t <- 2 to SelectK) {
      val prevSels = (1 until t).map(i => s"SELECT qid, vec_id FROM s$i").mkString(" UNION ALL ")
      sb.append(
        s""",
           |sel$t AS MATERIALIZED ($prevSels),
           |sc$t AS (
           |  SELECT c.qid, c.vec_id, c.rnk, $lam * c.rel - $oneMinus * max(p.sim) AS mmr
           |  FROM cand c
           |  LEFT JOIN sel$t x ON x.qid = c.qid AND x.vec_id = c.vec_id
           |  JOIN sel$t s ON s.qid = c.qid
           |  JOIN pair p ON p.qid = c.qid AND p.ia = c.vec_id AND p.ib = s.vec_id
           |  WHERE x.vec_id IS NULL
           |  GROUP BY c.qid, c.vec_id, c.rnk, c.rel),
           |s$t AS MATERIALIZED (SELECT qid, vec_id, rnk, mmr AS mmr_score FROM (
           |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY mmr DESC, rnk ASC) AS rr
           |  FROM sc$t) WHERE rr = 1)""".stripMargin)
    }
    val union = (1 to SelectK)
      .map(t => s"SELECT qid, vec_id, $t AS step, mmr_score FROM s$t")
      .mkString("\n UNION ALL ")
    sb.append(
      s"""
         |SELECT qid, vec_id, CAST(step AS INT) AS mmr_rank, mmr_score FROM (
         |$union)
         |ORDER BY qid, mmr_rank""".stripMargin)
    sb.toString
  }

  val mmrRerankSql: String = {
    import graft.OracleSql
    val nq = VectorSearch.NQueries
    s"""WITH nrm AS MATERIALIZED (
       |  SELECT vec_id, sqrt(${OracleSql.dot("embedding", "embedding")}) AS nm
       |  FROM embeddings),
       |q AS (SELECT e.vec_id AS qid, e.embedding AS qv, n.nm AS qn
       |      FROM embeddings e JOIN nrm n ON e.vec_id = n.vec_id
       |      WHERE e.vec_id < $nq),
       |sc AS (SELECT q.qid, e.vec_id,
       |        ${OracleSql.dot("q.qv", "e.embedding")} / (n.nm * q.qn) AS rel
       |       FROM q CROSS JOIN embeddings e JOIN nrm n ON e.vec_id = n.vec_id),
       |cand AS MATERIALIZED (SELECT qid, vec_id, rel, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id ASC) AS rnk
       |  FROM sc) WHERE rnk <= $CandidateK),
       |$pairCte""".stripMargin + greedyUnroll("0.5e0", "0.5e0")
  }

  /** mmr_combined's twin: the candidate pool is the hybrid fused top-K
    * (Bm25.hybridCtes re-derives it), rel = rrf, candidates re-numbered
    * densely in hybrid-rank order after the embedding inner join (the
    * same order the Scala loop sorts by), then the identical unrolled
    * greedy at λ=0.7. */
  val mmrCombinedSql: String = {
    import graft.OracleSql
    s"""WITH ${Bm25.hybridCtes},
       |nrm AS MATERIALIZED (
       |  SELECT vec_id, sqrt(${OracleSql.dot("embedding", "embedding")}) AS nm
       |  FROM embeddings),
       |cand AS MATERIALIZED (
       |  SELECT hy.qid, hy.id AS vec_id, hy.rrf AS rel,
       |         row_number() OVER (PARTITION BY hy.qid ORDER BY hy.rnk ASC) AS rnk
       |  FROM hy JOIN embeddings e ON e.vec_id = hy.id),
       |$pairCte""".stripMargin + greedyUnroll("0.7e0", "(1.0e0 - 0.7e0)")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("mmr_rerank" -> (mmrRerank _), "mmr_combined" -> (mmrCombined _))
  val oracles: Map[String, String] =
    Map("mmr_rerank" -> mmrRerankSql, "mmr_combined" -> mmrCombinedSql)
}
