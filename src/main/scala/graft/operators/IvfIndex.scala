package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.Tables

/** IVF (inverted-file) approximate nearest neighbor — the Spark-native
  * ANN-at-rest that plays the role of the reference's HNSW index
  * (vector_index.py index_type='hnsw'): graph ANN is a pointer-chasing
  * single-node structure; on a cluster the idiomatic equivalent is
  * k-means partitioning + partition-pruned probes.
  *
  * Scale design: centroids are trained on a bounded driver-side sample
  * (deterministic Lloyd, fixed seed) — at 100 TB you sample ~1e6 rows,
  * never the corpus. Assignment is a broadcast map over the corpus; a
  * persisted index is parquet partitioned by centroid id, so an
  * nprobe/nlist fraction of data is scanned per query batch via
  * partition pruning.
  */
object IvfIndex {
  /** Deterministic Lloyd k-means (kmeans++-free: seeds are the first k
    * distinct sample points in id order — reproducible across runs). */
  def trainCentroids(sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty k-means sample")
    val dim = sample(0).length
    var centroids = sample.take(k).map(_.clone)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(centroids, v)
        counts(c) += 1
        val s = sums(c)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0L) centroids(c) // keep empty centroid in place
        else {
          val s = sums(c)
          Array.tabulate(dim)(i => s(i) / counts(c))
        }
      }
      it += 1
    }
    centroids
  }

  def nearest(centroids: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var d = 0.0; var i = 0
      while (i < v.length) { val df = v(i) - ctr(i); d += df * df; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  def nearestN(centroids: Array[Array[Double]], v: Array[Double], n: Int): Array[Int] =
    centroids.indices.map { c =>
      val ctr = centroids(c)
      var d = 0.0; var i = 0
      while (i < v.length) { val df = v(i) - ctr(i); d += df * df; i += 1 }
      (d, c)
    }.sortBy(t => (t._1, t._2)).take(n).map(_._2).toArray

  /** Build: assign every corpus row to its nearest centroid. Persisting
    * `assigned.write.partitionBy("centroid")` gives the pruned layout. */
  def assign(corpus: DataFrame, centroids: Array[Array[Double]],
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(centroids)
    import spark.implicits._
    corpus.select(col(idCol).cast("long"), col(vecCol).cast(ArrayType(DoubleType)))
      .as[(Long, Seq[Double])]
      .map { case (id, v) => (id, v, nearest(bc.value, v.toArray)) }
      .toDF(idCol, vecCol, "centroid")
  }

  /** Probe-limited search: per query, scan only the nprobe nearest
    * centroid buckets (expressed as a pushable `centroid IN (...)`
    * filter per query — on a partitioned index this prunes files). */
  def search(corpus: DataFrame, queries: DataFrame, k: Int,
             nlist: Int, nprobe: Int, iters: Int = 10,
             sampleCap: Int = 100000): (DataFrame, Array[Array[Double]]) = {
    val spark = corpus.sparkSession
    val sample = corpus.select(col("embedding").cast(ArrayType(DoubleType)))
      .limit(sampleCap).collect().map(_.getSeq[Double](0).toArray)
    val centroids = trainCentroids(sample, nlist, iters)
    val assigned = assign(corpus, centroids)

    val qRows = queries.select(col("vec_id").cast("long"),
      col("embedding").cast(ArrayType(DoubleType))).collect()
    val probes = qRows.map { r =>
      (r.getLong(0), nearestN(centroids, r.getSeq[Double](1).toArray, nprobe))
    }
    val probeDf = spark.createDataFrame(
      spark.sparkContext.parallelize(probes.flatMap { case (qid, cs) => cs.map(c => (qid, c)) }.toSeq, 1))
      .toDF("qid", "centroid")

    // Restrict corpus to probed buckets per query, then exact re-rank.
    val cand = assigned.join(probeDf, "centroid")
    val scored = cand.join(
      queries.select(col("vec_id").as("qid"), col("embedding").cast(ArrayType(DoubleType)).as("qv")),
      "qid")
      .withColumn("score", graft.functions.VectorOps.cosineSim(col("embedding"), col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id").asc)
    val res = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "vec_id", "score", "rank")
      .orderBy("qid", "rank")
    (res, centroids)
  }

  def ivfSearch(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < VectorSearch.NQueries)
    search(emb, queries, VectorSearch.K, nlist = 16, nprobe = 4)._1
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("ivf_search" -> (ivfSearch _))
  // k-means is not SQL-expressible → rows-only; recall vs exact kNN is
  // spec'd in IvfIndexSpec.
  val oracles: Map[String, String] = Map.empty
}
