package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{OracleSql, Tables}

/** Multi-scale matryoshka search — the Spark re-expression of the
  * reference's `forward_multi_scale` (projection.py:222-263: one
  * forward pass emits the embedding at every nested dim). The search
  * analogue: ONE corpus scan produces the exact top-k at EVERY
  * truncation scale simultaneously.
  *
  * The point is shared compute: a matryoshka prefix dot at dim d is a
  * running-sum snapshot of the dim-64 dot, so scoring all four scales
  * costs one 64-term accumulation per (query, row) — not four scans
  * and not 4× the multiplies (matryoshka_recall, by contrast, runs one
  * independent search per scale because its JOIN structure needs them
  * as separate relations). Per-partition state is one bounded heap per
  * (scale, query) — scales·q·k entries — and the only shuffle is the
  * tiny partial-heap merge, exactly the knn_cosine posture, so the
  * operator scales the same way brute-force kNN does.
  *
  * Output: (dim, qid, vec_id, score, rank) — rank 1..k per (dim, qid)
  * by score desc, vec_id asc; score is prefix-cosine (truncate + L2
  * renorm is cosine on the prefix, projection.py MatryoshkaProjection).
  */
object Multiscale {
  val Scales: Seq[Int] = Seq(8, 16, 32, 64) // ascending: prefix snapshots
  val K: Int = VectorSearch.K

  def multiscaleSearch(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    topKAllScales(emb, emb.filter(col("vec_id") < VectorSearch.NQueries), K, Scales)
  }

  /** Exact top-k per (scale, query) in one corpus pass. Served by the
    * InternalRow-direct custom physical operator (plans.
    * MultiscaleTopKExec via the same planner strategy as knn_cosine):
    * the corpus scan feeds the per-(scale,query) heaps without Dataset
    * encoder boxing, and the only shuffle is the tiny partial-heap
    * merge under the final window. */
  def topKAllScales(corpus: DataFrame, queries: DataFrame, k: Int,
                    scales: Seq[Int]): DataFrame = {
    val spark = corpus.sparkSession
    graft.plans.VectorTopK.install(spark)
    val sc = scales.sorted
    val qs = queries
      .select(col("vec_id").cast("long"), col("embedding").cast(ArrayType(DoubleType)))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq
    require(qs.length <= Knn.MaxBroadcastQueries,
      s"query set over ${Knn.MaxBroadcastQueries}: chunk the corpus passes")
    val prepared = corpus.select(
      col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
    val partials = org.apache.spark.sql.graftshim.Shims.ofRows(spark,
      graft.plans.MultiscaleTopKNode(
        org.apache.spark.sql.graftshim.Shims.logicalPlan(prepared), qs, k, sc))

    val w = Window.partitionBy("dim", "qid").orderBy(col("score").desc, col("vec_id").asc)
    partials
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("dim", "qid", "rank")
  }

  /** Twin: per-scale prefix-cosine rank, one CTE per scale. The prefix
    * dot/norm unrolls left-assoc (OracleSql.dot with dim = scale) — the
    * identical association the running-sum snapshot takes. */
  val multiscaleSearchSql: String = {
    val nq = VectorSearch.NQueries
    val perScale = Scales.sorted.map { d =>
      s"""SELECT $d AS dim, q.qid, e.vec_id,
         |  ${OracleSql.dot("q.qv", "e.embedding", d)} / (n$d.nm * qn$d.nm) AS score
         |FROM q CROSS JOIN embeddings e
         |  JOIN nrm$d n$d ON e.vec_id = n$d.vec_id
         |  JOIN nrm$d qn$d ON q.qid = qn$d.vec_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    val nrmCtes = Scales.sorted.map { d =>
      s"""nrm$d AS (SELECT vec_id, sqrt(${OracleSql.dot("embedding", "embedding", d)}) AS nm
         |          FROM embeddings)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < $nq),
       |$nrmCtes,
       |s AS ($perScale)
       |SELECT dim, qid, vec_id, score, CAST(rnk AS INT) AS "rank" FROM (
       |  SELECT *, row_number() OVER (PARTITION BY dim, qid ORDER BY score DESC, vec_id ASC) AS rnk
       |  FROM s)
       |WHERE rnk <= $K ORDER BY dim, qid, rnk""".stripMargin
  }

  /** Device-tier dimension selection (projection.py:265-301
    * `get_optimal_dim_for_device`): for a device profile
    * (memory budget, latency target, expected index size), pick the
    * LARGEST matryoshka dim whose fp16 footprint
    * (num_vectors · dim · 2 bytes) fits the memory budget and whose
    * estimated scan latency (dim µs at the reference's 0.001 ms/dim
    * rule) fits the latency target; fall back to the smallest dim when
    * nothing fits. Reformulated integer-exact (bytes vs mb·2²⁰, µs vs
    * ms·10³ — equivalent inequalities, no float divergence), evaluated
    * as a relational query over a literal device-profile table: the
    * dims table cross-joins the profiles, constraints filter, max(dim)
    * picks, coalesce supplies the fallback — the same shape a catalog
    * of real device fleets would run at scale. NULL = unconstrained,
    * as in the reference. */
  /** The reference's static mobile-tier catalog
    * (projection.py:439-455 `get_matryoshka_dim_for_mobile_tier`):
    * tier → recommended dim, absorbed as literal rows of the same
    * device catalog (tier_unknown carries the reference's
    * `.get(default=256)` fallback). Footprint uses the mobile
    * profile's fleet size so the row shape matches the computed
    * branch. */
  private val MobileTiers = Seq(
    ("tier_high", 512), ("tier_mid", 256), ("tier_low", 128),
    ("tier_ultra_low", 64), ("tier_unknown", 256))
  private val MobileTierVectors = 100000L

  def deviceDim(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // (device, memory_mb nullable, latency_ms nullable, num_vectors)
    val profiles = Seq(
      ("edge_tiny", Some(1L), Some(20L), 100000L),
      ("mobile", Some(4L), Some(40L), 100000L),
      ("laptop", Some(64L), None, 500000L),
      ("server", None, None, 1000000L),
      ("latency_bound", None, Some(24L), 1000000L),
      ("impossible", Some(0L), Some(1L), 1000000L))
      .toDF("device", "memory_mb", "latency_ms", "num_vectors")
    val dims = Scales.toDF("dim")
    val fits = profiles.join(dims)
      .filter((col("memory_mb").isNull ||
          col("num_vectors") * col("dim") * 2L <= col("memory_mb") * (1L << 20)) &&
        (col("latency_ms").isNull || col("dim") <= col("latency_ms") * 1000L))
      .groupBy("device").agg(max(col("dim")).as("fit_dim"))
    val computed = profiles.join(fits, Seq("device"), "left")
      .select(col("device"),
        coalesce(col("fit_dim"), lit(Scales.min)).as("dim"),
        (col("num_vectors") * coalesce(col("fit_dim"), lit(Scales.min)) * 2L).as("fp16_bytes"))
    val tiers = MobileTiers.toDF("device", "dim")
      .select(col("device"), col("dim"),
        (lit(MobileTierVectors) * col("dim") * 2L).as("fp16_bytes"))
    computed.unionByName(tiers).orderBy("device")
  }

  private val deviceDimSql: String = {
    val profiles =
      """('edge_tiny', 1, 20, 100000), ('mobile', 4, 40, 100000),
        |('laptop', 64, NULL, 500000), ('server', NULL, NULL, 1000000),
        |('latency_bound', NULL, 24, 1000000), ('impossible', 0, 1, 1000000)""".stripMargin
    s"""WITH p(device, memory_mb, latency_ms, num_vectors) AS (VALUES $profiles),
       |d(dim) AS (VALUES ${Scales.map(d => s"($d)").mkString(", ")}),
       |f AS (SELECT p.device, max(d.dim) AS fit_dim
       |      FROM p CROSS JOIN d
       |      WHERE (p.memory_mb IS NULL
       |             OR p.num_vectors * d.dim * 2 <= p.memory_mb * 1048576)
       |        AND (p.latency_ms IS NULL OR d.dim <= p.latency_ms * 1000)
       |      GROUP BY 1),
       |t(device, dim) AS (VALUES ${MobileTiers.map { case (n, d) => s"('$n', $d)" }.mkString(", ")})
       |SELECT p.device, CAST(coalesce(f.fit_dim, ${Scales.min}) AS INT) AS dim,
       |  CAST(p.num_vectors * coalesce(f.fit_dim, ${Scales.min}) * 2 AS BIGINT) AS fp16_bytes
       |FROM p LEFT JOIN f ON f.device = p.device
       |UNION ALL
       |SELECT t.device, CAST(t.dim AS INT) AS dim,
       |  CAST($MobileTierVectors * t.dim * 2 AS BIGINT) AS fp16_bytes
       |FROM t
       |ORDER BY device""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("multiscale_search" -> (multiscaleSearch _),
      "device_dim" -> (deviceDim _))

  val oracles: Map[String, String] =
    Map("multiscale_search" -> multiscaleSearchSql,
      "device_dim" -> deviceDimSql)
}
