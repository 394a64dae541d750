package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{OracleSql, Tables}

/** ColBERT-style multi-vector late-interaction retrieval (Khattab &
  * Zaharia, SIGIR'20 — MaxSim scoring).
  *
  * The reference stores ONE embedding per item (vector_index.py keys
  * `id -> vector`); modern retrieval stacks increasingly store SEVERAL
  * vectors per document (one per token/chunk/patch) and score a query
  * against a document by late interaction:
  *
  *   maxsim(q, d) = Σ_{q_i ∈ q tokens}  max_{d_j ∈ d tokens} cos(q_i, d_j)
  *
  * — each query token picks its best-matching document token, and the
  * per-token winners sum. This file re-expresses that Spark-first over
  * the `embeddings` table, modeling multi-vector docs as fixed-arity
  * token groups: doc_id = vec_id div Slots, slot = vec_id mod Slots
  * (deterministic, so the SQL twin derives the identical grouping).
  *
  * Plan shape at 100 TB: the query side is tiny (q docs × Slots token
  * vectors) → BROADCAST; the corpus scans ONCE through a broadcast
  * nested-loop join with the codegen CosineSimD kernel inline; the
  * (query-token, corpus-vector) pair set never materializes — partial
  * aggregation collapses it map-side to ≤ q·Slots rows per corpus doc
  * before the single (qid, doc_id)-keyed exchange, whose volume is
  * q × n_docs slot-max rows (the same asymptotic as exact kNN's scored
  * pairs). Exact-by-contract, like knn_cosine: the ANN scale path
  * composes the engine's existing routing (IVF centroids over the
  * doc-token vectors) in front of the same scoring tail.
  *
  * Bit-exactness: cos is the codegen left-to-right kernel the oracle
  * unrolls term-for-term (knn_cosine's proven pairing); `max` over an
  * identical value set is order-independent; the per-doc score adds
  * the Slots slot-maxima in WRITTEN order (m0+m1+m2+m3, left-assoc
  * IEEE on both engines — the hybrid_rrf discipline); ties break by
  * doc_id. */
object MultiVector {
  val Slots = 4   // token vectors per document
  val NQDocs = 3  // query docs: doc_id < 3 (12 query token vectors)
  val K = 10      // final list length

  /** Exact MaxSim top-K per query doc over the slot-grouped corpus. */
  def maxsim(s: SparkSession, dir: String): DataFrame =
    maxsimOverEmb(Tables.load(s, dir, "embeddings"))

  /** The same pipeline over any (vec_id, embedding) frame — shared by
    * the graded query and the ScaleProbe throughput datapoint. */
  def maxsimOverEmb(emb: DataFrame): DataFrame = {
    val tok = emb
      .select(expr(s"vec_id div $Slots").as("doc_id"),
        pmod(col("vec_id"), lit(Slots)).cast("int").as("slot"),
        col("embedding"))
    val qtok = tok.filter(col("doc_id") < NQDocs)
      .select(col("doc_id").as("qid"), col("slot").as("qslot"),
        col("embedding").as("qv"))
    val pairs = tok.crossJoin(broadcast(qtok))
      .withColumn("c",
        graft.functions.VectorOps.cosineSim(col("qv"), col("embedding")))
    // one aggregate does both reductions: max over the doc's token
    // vectors per query slot (each qslot's max lands in its own
    // conditional-max column), then the score adds the slot maxima in
    // written order — no second shuffle
    val slotMax = pairs.groupBy("qid", "doc_id").agg(
      max(when(col("qslot") === 0, col("c"))).as("m0"),
      max(when(col("qslot") === 1, col("c"))).as("m1"),
      max(when(col("qslot") === 2, col("c"))).as("m2"),
      max(when(col("qslot") === 3, col("c"))).as("m3"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id").asc)
    slotMax
      .withColumn("score", col("m0") + col("m1") + col("m2") + col("m3"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("qid"), col("doc_id"), col("score"),
        col("rank").cast("int").as("rank"))
      .orderBy("qid", "rank")
  }

  val maxsimSql: String =
    s"""WITH tok AS (SELECT vec_id // $Slots AS doc_id, vec_id % $Slots AS slot,
       |                    embedding FROM embeddings),
       |q AS (SELECT doc_id AS qid, slot AS qslot, embedding AS qv
       |      FROM tok WHERE doc_id < $NQDocs),
       |p AS (SELECT q.qid, q.qslot, t.doc_id,
       |        ${OracleSql.cosine("q.qv", "t.embedding")} AS c
       |      FROM q CROSS JOIN tok t),
       |m AS (SELECT qid, doc_id,
       |        max(CASE WHEN qslot = 0 THEN c END) AS m0,
       |        max(CASE WHEN qslot = 1 THEN c END) AS m1,
       |        max(CASE WHEN qslot = 2 THEN c END) AS m2,
       |        max(CASE WHEN qslot = 3 THEN c END) AS m3
       |      FROM p GROUP BY qid, doc_id),
       |sc AS (SELECT qid, doc_id, m0 + m1 + m2 + m3 AS score FROM m)
       |SELECT qid, doc_id, score, CAST(rnk AS INT) AS "rank" FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY score DESC, doc_id ASC) AS rnk FROM sc)
       |WHERE rnk <= $K ORDER BY qid, rnk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multivector_maxsim" -> (maxsim _))

  val oracles: Map[String, String] = Map(
    "multivector_maxsim" -> maxsimSql)
}
