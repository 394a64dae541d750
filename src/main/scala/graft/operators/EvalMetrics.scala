package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{OracleSql, Tables}

/** IR evaluation metrics — recall@k / precision@k / AP / NDCG@k
  * (reference: src/utils/metrics.py:31-166) computed distributed, per
  * query, with label-match as relevance.
  *
  * Determinism: every aggregate in the result path is an INTEGER sum —
  * DCG weights are pre-scaled by 1e15 (w·1e15 rounds to long), AP
  * terms by lcm(1..10)=2520 — so sums are order-independent and exact
  * in both engines; a single double division happens at the end.
  * (Plain double window-sums would NOT reproduce: DuckDB aggregates
  * ordered frames via segment trees, a different association.)
  */
object EvalMetrics {
  val K = 10
  /** round(1e15 / log2(r+1)) for r = 1..10, and prefix sums (ideal DCG). */
  val WScaled: Seq[Long] = Seq(
    1000000000000000L, 630929753571458L, 500000000000000L, 430676558073393L,
    386852807234542L, 356207187108022L, 333333333333333L, 315464876785729L,
    301029995663981L, 289064826317888L)
  val WPrefixScaled: Seq[Long] = Seq(
    1000000000000000L, 1630929753571458L, 2130929753571458L, 2561606311644851L,
    2948459118879393L, 3304666305987415L, 3637999639320748L, 3953464516106477L,
    4254494511770458L, 4543559338088346L)
  /** lcm(1..10): makes h·cum_hits/r integral when scaled. */
  val ApScale = 2520L

  def evalMetrics(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < VectorSearch.NQueries)
    // Exact top-(K+1) then drop self → top-K non-self neighbors.
    val knn = Knn.topK(emb, queries, K + 1, Knn.Cosine)
      .filter(col("qid") =!= col("vec_id"))
    val reRank = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id").asc)
    val labels = emb.select(col("vec_id"), col("label"))
    val qlabels = emb.select(col("vec_id").as("qid"), col("label").as("qlab"))
    val relCounts = emb.groupBy(col("label").as("qlab2")).agg(count(lit(1)).as("lab_cnt"))

    val wArr = array(WScaled.map(lit): _*)
    val pArr = array(WPrefixScaled.map(lit): _*)
    val cumW = Window.partitionBy("qid").orderBy("r")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    knn.withColumn("r", row_number().over(reRank))
      .filter(col("r") <= K)
      .join(broadcast(labels), "vec_id")
      .join(broadcast(qlabels), "qid")
      .withColumn("h", when(col("label") === col("qlab"), 1L).otherwise(0L))
      .withColumn("cum_hits", sum(col("h")).over(cumW))
      .groupBy("qid", "qlab")
      .agg(
        sum(col("h")).as("hits"),
        sum(col("h") * col("cum_hits") * (lit(ApScale) / col("r")).cast("long")).as("ap_s"),
        sum(col("h") * element_at(wArr, col("r"))).as("dcg_s"))
      .join(broadcast(relCounts), col("qlab") === col("qlab2"))
      .withColumn("n_rel", col("lab_cnt") - 1L)
      // n_rel = 0 (query's label unique in the corpus): recall/ap/ndcg
      // are 0/0 → define them as 0.0, and clamp the ideal-DCG array
      // index to ≥1 (element_at is 1-based; index 0 throws). Mirrored
      // in the oracle SQL.
      .select(col("qid"), col("n_rel"),
        when(col("n_rel") === 0L, lit(0.0))
          .otherwise(col("hits").cast("double") / col("n_rel").cast("double")).as("recall"),
        (col("hits").cast("double") / lit(10.0)).as("precision"),
        when(col("n_rel") === 0L, lit(0.0))
          .otherwise(col("ap_s").cast("double") / lit(2520.0) / col("n_rel").cast("double")).as("ap"),
        when(col("n_rel") === 0L, lit(0.0))
          .otherwise(col("dcg_s").cast("double") /
            element_at(pArr, greatest(lit(1), least(lit(K), col("n_rel"))).cast("int"))
              .cast("double")).as("ndcg"))
      .orderBy("qid")
  }

  val evalMetricsSql: String = {
    val wList = WScaled.mkString("[", ", ", "]")
    val pList = WPrefixScaled.mkString("[", ", ", "]")
    s"""WITH nrm AS (SELECT vec_id, sqrt(${OracleSql.dot("embedding", "embedding")}) AS nm
       |             FROM embeddings),
       |q AS (SELECT e.vec_id AS qid, e.embedding AS qv, e.label AS qlab, n.nm AS qn
       |      FROM embeddings e JOIN nrm n ON e.vec_id = n.vec_id
       |      WHERE e.vec_id < ${VectorSearch.NQueries}),
       |s AS (SELECT q.qid, q.qlab, e.vec_id, e.label,
       |        ${OracleSql.dot("q.qv", "e.embedding")} / (n.nm * q.qn) AS score
       |      FROM q CROSS JOIN embeddings e JOIN nrm n ON e.vec_id = n.vec_id
       |      WHERE e.vec_id <> q.qid),
       |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS r
       |      FROM s),
       |h AS (SELECT qid, qlab, r, CASE WHEN label = qlab THEN 1 ELSE 0 END AS h
       |      FROM r WHERE r <= $K),
       |c1 AS (SELECT *, CAST(SUM(h) OVER (PARTITION BY qid ORDER BY r ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_hits
       |       FROM h),
       |g AS (SELECT qid, qlab,
       |        CAST(sum(h) AS BIGINT) AS hits,
       |        CAST(sum(h * cum_hits * (2520 // r)) AS BIGINT) AS ap_s,
       |        CAST(sum(h * ($wList)[r]) AS BIGINT) AS dcg_s
       |      FROM c1 GROUP BY 1, 2),
       |rel AS (SELECT label, count(*) AS lab_cnt FROM embeddings GROUP BY 1)
       |SELECT qid, CAST(lab_cnt - 1 AS BIGINT) AS n_rel,
       | CASE WHEN lab_cnt = 1 THEN 0.0e0
       |      ELSE CAST(hits AS DOUBLE)/CAST(lab_cnt - 1 AS DOUBLE) END AS recall,
       | CAST(hits AS DOUBLE)/10.0 AS precision,
       | CASE WHEN lab_cnt = 1 THEN 0.0e0
       |      ELSE CAST(ap_s AS DOUBLE)/2520.0/CAST(lab_cnt - 1 AS DOUBLE) END AS ap,
       | CASE WHEN lab_cnt = 1 THEN 0.0e0
       |      ELSE CAST(dcg_s AS DOUBLE)
       |        /CAST(($pList)[greatest(1, least($K, CAST(lab_cnt - 1 AS INT)))] AS DOUBLE) END AS ndcg
       |FROM g JOIN rel ON g.qlab = rel.label
       |ORDER BY qid""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("eval_metrics" -> (evalMetrics _))
  val oracles: Map[String, String] =
    Map("eval_metrics" -> evalMetricsSql)
}
