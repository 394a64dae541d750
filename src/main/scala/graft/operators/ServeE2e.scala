package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.Tables

/** The composed SERVING stack as ONE graded dataflow — the query-time
  * sibling of pipeline_e2e. Every component is an individually-graded
  * operator; what this key grades is the path a deployment actually
  * runs per request, over AT-REST indexes built once:
  *
  *   sparse: BM25 top-20 off the persisted postings layout (the
  *           corpus text is never re-tokenized — no documents scan
  *           anywhere in the serve plan)
  *   dense:  1-bit coded IVF top-20 off the centroid-partitioned
  *           coded layout (explicit `centroid IN` PartitionFilters;
  *           the candidate stage reads ONLY (vec_id, code) — the
  *           float column stays un-decoded until the q·R rerank)
  *   fuse:   reciprocal-rank fusion of the two lists (hybrid_rrf's
  *           exact arithmetic, shared fuseRrf)
  *   rerank: MMR diversity greedy at λ=0.7 over the fused pool
  *           (mmr_combined's loop, rel = rrf)
  *
  * Composition contract (ServeE2eSpec): after the request's probe
  * routing (a |queries|-row driver computation — the established
  * bounded stash idiom; a real request ARRIVES with its vector),
  * building the full fused+MMR plan launches ZERO Spark jobs, the
  * plan scans no documents/embeddings base table on the retrieval
  * side, and contains no SortMergeJoin — every join is broadcast
  * (query-sized, vocabulary-sized, or top-K-sized build sides).
  *
  * 100 TB shape: both layouts are the graded at-rest forms
  * (salt-split postings, centroid-partitioned codes); a request
  * batch touches O(|query terms|) postings row groups and
  * nprobe/nlist code partitions, and everything after the two
  * candidate scans is top-K-sized. Reference: search_engine.py
  * 174-223 serves dense-only from its built index; this is the
  * hybrid production shape over the same lifecycle.
  */
object ServeE2e {

  /** Build-once (per JVM, per corpus dir) coded dense layout + its
    * frozen centroid codebook — the dense sibling of Bm25.layoutFor.
    * Training is deterministic (fixed sample, fixed Lloyd), so the
    * cache is content-stable across calls. */
  private val denseLayouts =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Array[Array[Double]])]()
  private[graft] def denseLayoutFor(s: SparkSession, dir: String)
      : (String, Array[Array[Double]]) =
    denseLayouts.computeIfAbsent(dir, _ => {
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = IvfIndex.trainCentroids(
        IvfIndex.trainSample(emb), BinaryQuant.IvfNlist, 10)
      val dst = java.nio.file.Files.createTempDirectory("graft_serve_ivf").toString
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => graft.Mat.deleteRecursively(dst)))
      BinaryQuant.writeCodedLayout(emb, centroids, dst)
      (dst, centroids)
    })

  @volatile private var lastServeCentroids: Array[Array[Double]] = _

  /** The opened at-rest layout tables — serve START-UP state. Opening
    * a parquet layout reads footers/listings (driver jobs); a serving
    * process does that once when it loads the index, never per
    * request, so the request-path contract (zero jobs at plan build,
    * ServeE2eSpec) is stated over these handles. */
  private[graft] case class OpenIndexes(tf: DataFrame, dl: DataFrame,
      dfT: DataFrame, tot: DataFrame, coded: DataFrame)

  private[graft] def openIndexes(s: SparkSession, sparseIdx: String,
      denseIdx: String): OpenIndexes = OpenIndexes(
    s.read.parquet(s"$sparseIdx/tf"),
    s.read.parquet(s"$sparseIdx/dl"),
    s.read.parquet(s"$sparseIdx/df"),
    s.read.parquet(s"$sparseIdx/tot"),
    s.read.parquet(denseIdx))

  /** The graded request: both layouts warm (build-once caches), the
    * query batch routed, then ONE lazy dataflow to the diversity-
    * reranked list. */
  def serveE2e(s: SparkSession, dir: String): DataFrame = {
    val sparseIdx = Bm25.layoutFor(s, dir)
    val (denseIdx, centroids) = denseLayoutFor(s, dir)
    lastServeCentroids = centroids
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < Bm25.NQueriesB)
    // request arrival: the query vectors are driver-side data (a real
    // request carries them); route each to its nprobe cells
    val qRows = queries.select(col("vec_id").cast("long"),
      col("embedding").cast(ArrayType(DoubleType))).collect()
    val probes = qRows.flatMap { r =>
      IvfIndex.nearestN(centroids, r.getSeq[Double](1).toArray,
        BinaryQuant.IvfNprobe).map(c => (r.getLong(0), c))
    }.toSeq
    val qv = queries.select(col("vec_id").as("qid"),
      col("embedding").cast(ArrayType(DoubleType)).as("qv"))
    serveOver(s, openIndexes(s, sparseIdx, denseIdx), probes, qv, emb)
  }

  /** The served dataflow GIVEN open indexes and routed probes — pure
    * plan construction (ServeE2eSpec pins zero jobs launched while
    * building it). The MMR join-back fetches candidate embeddings
    * with the tiny fused list BROADCAST against the corpus table —
    * at 100 TB that's a semi-join point-read, never a shuffle of the
    * corpus. */
  private[graft] def serveOver(s: SparkSession, idx: OpenIndexes,
      probes: Seq[(Long, Int)], qv: DataFrame,
      emb: DataFrame): DataFrame = {
    import s.implicits._
    // sparse: BM25 top-20 off the at-rest postings; query terms come
    // off the index (the graded more-like-this shape — bm25_search)
    val qterms = idx.tf
      .filter(col("doc_id") < Bm25.NQueriesB)
      .select(col("doc_id").as("qid"), col("word"))
    val bm = Bm25.scoreAndRank(idx.tf, idx.dl, idx.dfT, idx.tot,
        qterms, Bm25.TopN)
      .select(col("qid"), col("doc_id").as("id"), col("rank").as("bm25_rank"))
    // dense: coded IVF top-20 off the at-rest coded layout
    val vec = BinaryQuant.ivfBinaryCodedPlan(idx.coded,
        probes, qv, Bm25.TopN, BinaryQuant.RerankR)
      .select(col("qid"), col("vec_id").as("id"), col("rank").as("vec_rank"))
    // fusion (hybrid_rrf) → MMR diversity rerank (mmr_combined, λ=0.7)
    val hy = Bm25.fuseRrf(vec, bm)
      .select(col("qid"), col("id").as("vec_id"), col("rrf"), col("rank"))
    val cands = emb
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("emb"))
      .join(broadcast(hy), "vec_id")
      .select(col("qid"), col("vec_id"), col("rrf"), col("rank"), col("emb"))
      .as[(Long, Long, Double, Int, Seq[Double])]
    cands.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val sorted = it.toArray.sortBy(_._4) // fused rank order
        val arr = sorted.map(t => (t._2, t._3, t._5.toArray))
        Mmr.select(arr, Mmr.SelectK, Mmr.CombinedLambda).zipWithIndex.map {
          case ((id, sc), i) => (qid, id, i + 1, sc)
        }.iterator
      }
      .toDF("qid", "vec_id", "mmr_rank", "mmr_score")
      .orderBy("qid", "mmr_rank")
  }

  /** One-statement twin: bm25Cte(top-20) + the coded-IVF dense twin
    * from this run's stashed centroid literals (assignment argmin,
    * (dist, idx)-ordered probes, byte-blocked asym cut, exact-cosine
    * rerank — ivf_binary_coded's arithmetic) + the RRF fusion CTEs +
    * the unrolled greedy MMR at λ=0.7 (mmr_combined's twin tail). */
  private[graft] def serveSql(centroids: Array[Array[Double]]): String = {
    import graft.OracleSql
    val nq = Bm25.NQueriesB; val k = Bm25.K; val topN = Bm25.TopN
    val nlist = centroids.length
    s"""WITH ${Bm25.bm25Cte(topN)},
       |vd AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${OracleSql.distList("embedding", centroids)} AS cdl
       |  FROM embeddings),
       |va AS (SELECT vec_id, embedding,
       |      CAST(list_position(cdl, list_min(cdl)) - 1 AS INT) AS centroid FROM vd),
       |pe AS (SELECT vec_id AS qid, unnest(cdl) AS dist, unnest(range(0, $nlist)) AS c
       |       FROM vd WHERE vec_id < $nq),
       |pr AS (SELECT qid, c FROM (
       |   SELECT qid, c, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, c ASC) AS rn
       |   FROM pe) WHERE rn <= ${BinaryQuant.IvfNprobe}),
       |vq AS (SELECT e.vec_id AS qid, e.embedding AS qv,
       |      ${OracleSql.norm("e.embedding")} AS qn
       |      FROM embeddings e WHERE e.vec_id < $nq),
       |c0 AS (SELECT p.qid, e.vec_id,
       |        ${BinaryQuant.asymSql("vq.qv", "e.embedding")} AS asym,
       |        ${OracleSql.dot("vq.qv", "e.embedding")}
       |          / (${OracleSql.norm("e.embedding")} * vq.qn) AS score
       |      FROM pr p JOIN va e ON e.centroid = p.c JOIN vq ON vq.qid = p.qid),
       |c1 AS (SELECT *, row_number() OVER
       |        (PARTITION BY qid ORDER BY asym DESC, vec_id ASC) AS ar FROM c0),
       |vec AS (SELECT qid, vec_id AS id, CAST(rnk AS INT) AS vec_rank FROM (
       |   SELECT qid, vec_id, row_number() OVER
       |     (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rnk
       |   FROM c1 WHERE ar <= ${BinaryQuant.RerankR}) WHERE rnk <= $topN),
       |fused AS (SELECT coalesce(vec.qid, bm.qid) AS qid,
       |                 coalesce(vec.id, bm.doc_id) AS id,
       |                 vec.vec_rank AS vec_rank, bm."rank" AS bm25_rank,
       |                 coalesce(1.0e0 / (${Bm25.RrfK} + vec.vec_rank), 0.0e0)
       |                   + coalesce(1.0e0 / (${Bm25.RrfK} + bm."rank"), 0.0e0) AS rrf
       |          FROM vec FULL OUTER JOIN bm
       |            ON bm.qid = vec.qid AND bm.doc_id = vec.id),
       |hy AS (SELECT * FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id ASC) AS rnk
       |  FROM fused) WHERE rnk <= $k),
       |nrm AS MATERIALIZED (
       |  SELECT vec_id, sqrt(${OracleSql.dot("embedding", "embedding")}) AS nm
       |  FROM embeddings),
       |cand AS MATERIALIZED (
       |  SELECT hy.qid, hy.id AS vec_id, hy.rrf AS rel,
       |         row_number() OVER (PARTITION BY hy.qid ORDER BY hy.rnk ASC) AS rnk
       |  FROM hy JOIN embeddings e ON e.vec_id = hy.id),
       |${Mmr.pairCte}""".stripMargin +
      Mmr.greedyUnroll("0.7e0", "(1.0e0 - 0.7e0)")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("serve_e2e" -> (serveE2e _))

  def oracles: Map[String, String] = {
    val m = Map.newBuilder[String, String]
    if (lastServeCentroids != null) m += "serve_e2e" -> serveSql(lastServeCentroids)
    m.result()
  }
}
