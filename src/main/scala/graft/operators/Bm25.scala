package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** BM25 keyword retrieval + reciprocal-rank-fusion hybrid search.
  *
  * The reference serves dense-vector similarity only
  * (search_engine.py:174-223 routes every query through an embedding
  * index); production multimodal search engines pair that with a
  * sparse keyword ranker and fuse the two lists — hybrid retrieval.
  * This file adds both halves Spark-first:
  *
  *  - `bm25_search`: Okapi BM25 (Robertson et al., TREC-3) over the
  *    `documents` corpus. The corpus-sized work is wordcount-shaped —
  *    postings shuffle as (word, doc_id, tf) rows, document text never
  *    moves past the tokenizing projection. The document-frequency
  *    table is vocabulary-sized → broadcast; the query-term table is
  *    query-sized → broadcast; corpus totals (N docs, T tokens) join
  *    on as a broadcast 1-row aggregate. At 100 TB nothing here
  *    changes: the only large shuffle keys on `word`.
  *
  *  - `hybrid_rrf`: reciprocal rank fusion (Cormack et al., SIGIR'09)
  *    of the BM25 list with the dense cosine top-k over the aligned
  *    `embeddings` table — score = Σ_systems 1/(60 + rank). RRF is
  *    THE standard hybrid combiner precisely because it needs no score
  *    calibration across systems — only ranks — which also makes it
  *    exactly reproducible.
  *
  * Bit-exactness strategy (same discipline as text_tfidf/text_repetition):
  * BM25's log-idf and float saturation are replaced by an integer-exact
  * rational formulation — with k1 = 6/5 and b = 3/4 the term weight
  *
  *   idf · tf(k1+1) / (tf + k1(1 − b + b·dl/avgdl)),  avgdl = T/N
  *
  * multiplies through by 20·T into the all-integer
  *
  *   contrib = (idf_ppk · (44·tf·T)) div (20·tf·T + 6·T + 18·dl·N)
  *   idf_ppk = ((N − df) · 1000) div df
  *
  * — monotone in tf and 1/df exactly like the float form, zero libm,
  * and the per-(query,doc) score is a SUM of longs (order-independent),
  * so the DuckDB twin reproduces it digit-for-digit. Long range is safe
  * through sf1 (idf_ppk ≤ N·10³ ≤ 5·10⁷; 44·tf·T ≤ 44·10²·2.7·10⁶ ≈
  * 1.2·10¹⁰; product ≤ 6·10¹⁷ < 2⁶³). RRF's 1/(60+rank) is a single
  * correctly-rounded IEEE division and the fusion adds exactly two such
  * terms in written order — deterministic on both engines.
  */
object Bm25 {
  val NQueriesB = 10  // query docs: doc_id < 10 (aligned with knn's vec_id < 10)
  val TopN = 20       // per-system candidate depth fed into RRF
  val K = 10          // final list length
  val RrfK = 60       // the standard RRF damping constant

  /** Per-(query, doc) BM25 scores over the corpus, top `n` per query.
    * Query = the distinct terms of each query document (the
    * more-like-this / related-documents shape; qtf weighting is
    * deliberately dropped — dedup'd terms keep the contract simple and
    * the oracle exact). */
  def bm25TopN(docs: DataFrame, n: Int): DataFrame = {
    // Every derived table comes off the (doc_id, word, tf) postings
    // aggregate — dl = Σtf per doc, df per word, corpus totals from dl,
    // query terms from tf's (already-distinct) keys. NOTE: per-branch
    // column pruning makes the four consumers' subplans differ, so
    // ReuseExchange does NOT fire and this one-shot form re-tokenizes
    // the corpus per branch — fine for the graded one-shot query, but
    // the serving shape at scale is writePostingsLayout + the probe
    // below: tokenize once into the at-rest inverted index, then every
    // query batch touches only the postings tables.
    val tf = docs.select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dfT = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val tot = dl.agg(sum("dl").as("big_t"), count(lit(1)).as("big_n"))
    val qterms = tf.filter(col("doc_id") < NQueriesB)
      .select(col("doc_id").as("qid"), col("word"))

    scoreAndRank(tf, dl, dfT, tot, qterms, n)
  }

  /** The shared scoring tail: integer-exact contributions joined off
    * the postings, summed per (query, doc), top `n` per query. */
  private def scoreAndRank(tf: DataFrame, dl: DataFrame, dfT: DataFrame,
      tot: DataFrame, qterms: DataFrame, n: Int): DataFrame = {
    val contrib = tf
      .join(broadcast(dfT), "word")
      .join(broadcast(qterms), "word")
      .crossJoin(broadcast(tot))
      .join(dl, "doc_id")
      .withColumn("idf_ppk", expr("((big_n - df) * 1000) div df"))
      .withColumn("contrib", expr(
        "(idf_ppk * (44 * tf * big_t)) div (20 * tf * big_t + 6 * big_t + 18 * dl * big_n)"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id").asc)
    contrib.groupBy("qid", "doc_id").agg(sum("contrib").as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("qid"), col("doc_id"), col("score"), col("rank").cast("int").as("rank"))
  }

  def bm25Search(s: SparkSession, dir: String): DataFrame =
    bm25TopN(Tables.load(s, dir, "documents"), K).orderBy("qid", "rank")

  /** The BM25 index as an at-rest layout (the production build-once /
    * query-many shape, mirroring the IVF coded layouts): one tokenize
    * pass writes the (doc_id, word, tf) postings repartitioned by word;
    * dl / df / corpus-total tables derive from the WRITTEN postings —
    * the corpus text is scanned exactly once, and no serve-time query
    * ever touches it again. */
  def writePostingsLayout(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    docs.select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .repartition(col("word"))
      .write.mode("overwrite").parquet(s"$dir/tf")
    val tf = spark.read.parquet(s"$dir/tf")
    tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      .write.mode("overwrite").parquet(s"$dir/dl")
    tf.groupBy("word").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$dir/df")
    spark.read.parquet(s"$dir/dl")
      .agg(sum("dl").as("big_t"), count(lit(1)).as("big_n"))
      .write.mode("overwrite").parquet(s"$dir/tot")
  }

  /** Merge sharded postings layouts (multi-writer ingest: each shard
    * indexed its own disjoint slice of the corpus) into one — the
    * sparse-index sibling of IVF's index_merge: shard tf tables union
    * and rewrite (disjoint doc_ids make the union itself the merged
    * postings; same-doc shards would groupBy-sum here), and dl / df /
    * corpus totals REBUILD from the merged postings — aggregates over
    * the postings table, never a corpus re-tokenize. */
  def mergePostingsLayouts(spark: SparkSession, shardDirs: Seq[String],
      dst: String): Unit = {
    shardDirs.map(d => spark.read.parquet(s"$d/tf")).reduce(_ unionByName _)
      .groupBy("doc_id", "word").agg(sum("tf").as("tf"))
      .repartition(col("word"))
      .write.mode("overwrite").parquet(s"$dst/tf")
    val tf = spark.read.parquet(s"$dst/tf")
    tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      .write.mode("overwrite").parquet(s"$dst/dl")
    tf.groupBy("word").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$dst/df")
    spark.read.parquet(s"$dst/dl")
      .agg(sum("dl").as("big_t"), count(lit(1)).as("big_n"))
      .write.mode("overwrite").parquet(s"$dst/tot")
  }

  /** Serve BM25 from the postings layout: identical arithmetic to
    * bm25TopN (bit-equal results — Round9Spec pins it), but the only
    * corpus-sized input is the at-rest postings table, joined once
    * against the broadcast query terms. */
  def bm25OverPostings(spark: SparkSession, dir: String,
      qterms: DataFrame, n: Int): DataFrame =
    scoreAndRank(
      spark.read.parquet(s"$dir/tf"),
      spark.read.parquet(s"$dir/dl"),
      spark.read.parquet(s"$dir/df"),
      spark.read.parquet(s"$dir/tot"),
      qterms, n)

  /** RRF fusion of the BM25 top-20 (over documents) with the dense
    * cosine top-20 (over the id-aligned embeddings table): score =
    * 1/(60+r_vec) + 1/(60+r_bm25), absent-from-a-list contributes 0.
    * A hit found by both systems outranks single-system hits — the
    * whole point of hybrid retrieval. */
  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val emb = Tables.load(s, dir, "embeddings")
    val bm = bm25TopN(docs, TopN)
      .select(col("qid"), col("doc_id").as("id"), col("rank").as("bm25_rank"))
    val vec = Knn.topK(emb, emb.filter(col("vec_id") < NQueriesB), TopN, Knn.Cosine)
      .select(col("qid"), col("vec_id").as("id"), col("rank").as("vec_rank"))
    fuseRrf(vec, bm)
  }

  /** RRF fusion of a dense rank list (qid, id, vec_rank) with a sparse
    * rank list (qid, id, bm25_rank) — shared by the batch and streaming
    * hybrid queries so their arithmetic is identical by construction. */
  def fuseRrf(vec: DataFrame, bm: DataFrame): DataFrame = {
    val fused = vec.join(bm, Seq("qid", "id"), "full_outer")
      .withColumn("rrf", expr(
        s"coalesce(1.0D / ($RrfK + vec_rank), 0.0D) + coalesce(1.0D / ($RrfK + bm25_rank), 0.0D)"))
    val w = Window.partitionBy("qid").orderBy(col("rrf").desc, col("id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("qid"), col("id"), col("vec_rank").cast("int").as("vec_rank"),
        col("bm25_rank").cast("int").as("bm25_rank"), col("rrf"),
        col("rank").cast("int").as("rank"))
      .orderBy("qid", "rank")
  }

  /** Retrieval-mode comparison table (the hybrid family's analog of
    * index_comparison): per query, how much the dense@10 and BM25@10
    * lists overlap, and where each hybrid@10 hit came from (both
    * source top-20 lists, dense-only, or bm25-only — read directly off
    * the fused row's rank nullability). All integer counts — exact. */
  def retrievalComparison(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val emb = Tables.load(s, dir, "embeddings")
    val hy = hybridRrf(s, dir)
    val d10 = Knn.topK(emb, emb.filter(col("vec_id") < NQueriesB), K, Knn.Cosine)
      .select(col("qid"), col("vec_id").as("id"))
    val b10 = bm25TopN(docs, K).select(col("qid"), col("doc_id").as("id"))
    val ov = d10.join(b10, Seq("qid", "id"))
      .groupBy("qid").agg(count(lit(1)).as("dense_bm25_overlap"))
    hy.groupBy("qid").agg(
        sum(when(col("vec_rank").isNotNull && col("bm25_rank").isNotNull, 1L)
          .otherwise(0L)).as("hybrid_both"),
        sum(when(col("vec_rank").isNotNull && col("bm25_rank").isNull, 1L)
          .otherwise(0L)).as("hybrid_dense_only"),
        sum(when(col("vec_rank").isNull && col("bm25_rank").isNotNull, 1L)
          .otherwise(0L)).as("hybrid_bm25_only"))
      .join(ov, Seq("qid"), "left")
      .withColumn("dense_bm25_overlap", coalesce(col("dense_bm25_overlap"), lit(0L)))
      .select(col("qid"), col("dense_bm25_overlap"), col("hybrid_both"),
        col("hybrid_dense_only"), col("hybrid_bm25_only"))
      .orderBy("qid")
  }

  // ------------------------------------------------------------ oracles

  /** The integer-exact BM25 pipeline, top `n` per query, as a DuckDB CTE
    * body (shared by both graded twins). */
  private def bm25Cte(n: Int): String =
    s"""tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
       |        FROM documents),
       |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
       |dfr AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS big_t,
       |               CAST(count(DISTINCT doc_id) AS BIGINT) AS big_n FROM tok),
       |qterms AS (SELECT DISTINCT doc_id AS qid, word FROM tok WHERE doc_id < $NQueriesB),
       |ctb AS (SELECT q.qid, tf.doc_id,
       |          ((((big_n - df) * 1000) // df) * (44 * tf * big_t))
       |            // (20 * tf * big_t + 6 * big_t + 18 * dl * big_n) AS contrib
       |        FROM tf
       |        JOIN dfr ON dfr.word = tf.word
       |        JOIN qterms q ON q.word = tf.word
       |        CROSS JOIN tot
       |        JOIN dl ON dl.doc_id = tf.doc_id),
       |bm AS (SELECT qid, doc_id, score, CAST(rnk AS INT) AS "rank" FROM (
       |         SELECT qid, doc_id, CAST(sum(contrib) AS BIGINT) AS score,
       |                row_number() OVER (PARTITION BY qid
       |                  ORDER BY sum(contrib) DESC, doc_id ASC) AS rnk
       |         FROM ctb GROUP BY qid, doc_id)
       |       WHERE rnk <= $n)""".stripMargin

  val bm25SearchSql: String =
    s"""WITH ${bm25Cte(K)}
       |SELECT qid, doc_id, score, "rank" FROM bm ORDER BY qid, "rank"""".stripMargin

  val hybridRrfSql: String = {
    import graft.OracleSql
    s"""WITH ${bm25Cte(TopN)},
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < $NQueriesB),
       |vs AS (SELECT q.qid, e.vec_id, ${OracleSql.cosine("q.qv", "e.embedding")} AS score
       |       FROM q CROSS JOIN embeddings e),
       |vec AS (SELECT qid, vec_id AS id, CAST(rnk AS INT) AS vec_rank FROM (
       |          SELECT *, row_number() OVER (PARTITION BY qid
       |            ORDER BY score DESC, vec_id ASC) AS rnk FROM vs)
       |        WHERE rnk <= $TopN),
       |fused AS (SELECT coalesce(vec.qid, bm.qid) AS qid,
       |                 coalesce(vec.id, bm.doc_id) AS id,
       |                 vec.vec_rank AS vec_rank, bm."rank" AS bm25_rank,
       |                 coalesce(1.0e0 / ($RrfK + vec.vec_rank), 0.0e0)
       |                   + coalesce(1.0e0 / ($RrfK + bm."rank"), 0.0e0) AS rrf
       |          FROM vec FULL OUTER JOIN bm
       |            ON bm.qid = vec.qid AND bm.doc_id = vec.id)
       |SELECT qid, id, vec_rank, bm25_rank, rrf, CAST(rnk AS INT) AS "rank" FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id ASC) AS rnk
       |  FROM fused)
       |WHERE rnk <= $K ORDER BY qid, rnk""".stripMargin
  }

  /** The same comparison derived inside one SQL statement: hybrid's
    * fused CTEs re-derived from bm25Cte(TopN) + the exact-cosine rank
    * CTE, per-query counts off rank nullability + a d10 ∩ b10 join. */
  val retrievalComparisonSql: String = {
    import graft.OracleSql
    s"""WITH ${bm25Cte(TopN)},
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < $NQueriesB),
       |vs AS (SELECT q.qid, e.vec_id, ${OracleSql.cosine("q.qv", "e.embedding")} AS score
       |       FROM q CROSS JOIN embeddings e),
       |vec AS (SELECT qid, vec_id AS id, CAST(rnk AS INT) AS vec_rank FROM (
       |          SELECT *, row_number() OVER (PARTITION BY qid
       |            ORDER BY score DESC, vec_id ASC) AS rnk FROM vs)
       |        WHERE rnk <= $TopN),
       |fused AS (SELECT coalesce(vec.qid, bm.qid) AS qid,
       |                 coalesce(vec.id, bm.doc_id) AS id,
       |                 vec.vec_rank AS vec_rank, bm."rank" AS bm25_rank,
       |                 coalesce(1.0e0 / ($RrfK + vec.vec_rank), 0.0e0)
       |                   + coalesce(1.0e0 / ($RrfK + bm."rank"), 0.0e0) AS rrf
       |          FROM vec FULL OUTER JOIN bm
       |            ON bm.qid = vec.qid AND bm.doc_id = vec.id),
       |hy AS (SELECT * FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id ASC) AS rnk
       |  FROM fused) WHERE rnk <= $K),
       |d10 AS (SELECT qid, id FROM vec WHERE vec_rank <= $K),
       |b10 AS (SELECT qid, doc_id AS id FROM bm WHERE "rank" <= $K),
       |ov AS (SELECT d10.qid, CAST(count(*) AS BIGINT) AS dense_bm25_overlap
       |       FROM d10 JOIN b10 ON b10.qid = d10.qid AND b10.id = d10.id
       |       GROUP BY d10.qid),
       |hp AS (SELECT qid,
       |  CAST(sum(CASE WHEN vec_rank IS NOT NULL AND bm25_rank IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hybrid_both,
       |  CAST(sum(CASE WHEN vec_rank IS NOT NULL AND bm25_rank IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS hybrid_dense_only,
       |  CAST(sum(CASE WHEN vec_rank IS NULL AND bm25_rank IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hybrid_bm25_only
       |  FROM hy GROUP BY qid)
       |SELECT hp.qid, coalesce(ov.dense_bm25_overlap, 0) AS dense_bm25_overlap,
       |       hybrid_both, hybrid_dense_only, hybrid_bm25_only
       |FROM hp LEFT JOIN ov ON ov.qid = hp.qid
       |ORDER BY hp.qid""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bm25_search" -> (bm25Search _),
    "hybrid_rrf" -> (hybridRrf _),
    "retrieval_comparison" -> (retrievalComparison _))

  val oracles: Map[String, String] = Map(
    "bm25_search" -> bm25SearchSql,
    "hybrid_rrf" -> hybridRrfSql,
    "retrieval_comparison" -> retrievalComparisonSql)
}
