package graft

import org.apache.spark.sql.functions._

/** API-surface completeness: the engine's pipelines are expressible in
  * PURE SQL through the registered functions — a user can drive kNN,
  * near-dup detection, and fingerprinting from `spark.sql` alone and
  * get results identical to the DataFrame operators. */
class SqlPipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("kNN in pure SQL == the custom-operator kNN") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, sfDir)
    val sql = spark.sql(
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
         |s AS (SELECT q.qid, e.vec_id, cosine_sim(q.qv, e.embedding) AS score
         |      FROM q CROSS JOIN embeddings e)
         |SELECT qid, vec_id, score, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rank
         |  FROM s)
         |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val emb = Tables.load(spark, sfDir, "embeddings")
    val op = operators.Knn.topK(emb, emb.filter($"vec_id" < 5), 10)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(sql == op)
  }

  test("simhash near-dup pairs in pure SQL == the operator") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, sfDir)
    val sql = spark.sql(
      s"""WITH sh AS (SELECT doc_id, simhash64(split(text, ' ')) AS h FROM documents)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       bit_count(a.h ^ b.h) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(a.h ^ b.h) <= ${operators.Dedup.SimHashMaxHamming}
         |ORDER BY 1, 2""".stripMargin)
      .as[(Long, Long, Int)].collect().toSeq
    val op = operators.Dedup.dedupSimhash(spark, sfDir)
      .as[(Long, Long, Int)].collect().toSeq
    assert(sql == op)
  }

  test("winnow + md5 fingerprints in pure SQL agree with the expressions") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, sfDir)
    val n = spark.sql(
      """SELECT count(*) AS n FROM (
        |  SELECT doc_id, size(winnow_fp(text)) AS w, md5_lower64(text) AS f
        |  FROM documents) WHERE w >= 1""".stripMargin)
      .head.getLong(0)
    assert(n == Tables.load(spark, sfDir, "documents").count())
  }
}
