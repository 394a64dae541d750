package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.Tables

/** Product quantization (reference: src/database/quantization.py):
  * split the vector into m subspaces, k-means each subspace, encode as
  * m uint8-range codes, decode = centroid lookup.
  *
  * Scale design mirrors IVF: codebooks are trained on a bounded driver
  * sample (the reference trains on the full set in memory —
  * quantization.py:28-57); encode/decode are embarrassingly parallel
  * maps with the codebooks broadcast.
  */
object ProductQuant {
  case class Codebooks(m: Int, subDim: Int, books: Array[Array[Array[Double]]]) extends Serializable

  def train(sample: Array[Array[Double]], m: Int, k: Int, iters: Int = 10): Codebooks = {
    val dim = sample(0).length
    require(dim % m == 0, s"dimension $dim not divisible by m=$m")
    val subDim = dim / m
    val books = Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      IvfIndex.trainCentroids(sub, k, iters)
    }
    Codebooks(m, subDim, books)
  }

  def encode(cb: Codebooks, v: Array[Double]): Array[Int] =
    Array.tabulate(cb.m) { s =>
      val sub = java.util.Arrays.copyOfRange(v, s * cb.subDim, (s + 1) * cb.subDim)
      IvfIndex.nearest(cb.books(s), sub)
    }

  def decode(cb: Codebooks, codes: Array[Int]): Array[Double] = {
    val out = new Array[Double](cb.m * cb.subDim)
    var s = 0
    while (s < cb.m) {
      System.arraycopy(cb.books(s)(codes(s)), 0, out, s * cb.subDim, cb.subDim)
      s += 1
    }
    out
  }

  /** Encode the corpus; emit codes + reconstruction error per vector.
    * compression_ratio mirrors quantization.py:120-124 (float32 dims →
    * one byte per subquantizer). */
  def pqCodes(s: SparkSession, dir: String): DataFrame = {
    val m = 8; val k = 16
    val emb = Tables.load(s, dir, "embeddings")
    val sample = emb.select(col("embedding").cast(ArrayType(DoubleType)))
      .limit(100000).collect().map(_.getSeq[Double](0).toArray)
    val cb = train(sample, m, k)
    val bc = s.sparkContext.broadcast(cb)
    import s.implicits._
    emb.select(col("vec_id").cast("long"), col("embedding").cast(ArrayType(DoubleType)))
      .as[(Long, Seq[Double])]
      .map { case (id, vSeq) =>
        val v = vSeq.toArray
        val codes = encode(bc.value, v)
        val rec = decode(bc.value, codes)
        var err = 0.0; var i = 0
        while (i < v.length) { val d = v(i) - rec(i); err += d * d; i += 1 }
        // codes as a scalar string, not array<int>: the driver's
        // pandas-side sort/hash of result parquet cannot hash ndarray
        // cells (round-1 compare crashed on this column)
        (id, codes.mkString("-"), math.sqrt(err), (v.length * 4.0) / bc.value.m)
      }
      .toDF("vec_id", "codes", "recon_err", "compression_ratio")
      .orderBy("vec_id")
  }

  /** ADC (asymmetric distance computation) search over PQ codes: per
    * query, precompute a [m × k] lookup table of squared distances
    * between the query's subvectors and each codebook centroid; a
    * vector's approximate distance is then m table lookups over its
    * 1-byte codes instead of a dim-wide float scan — 32× less memory
    * traffic per candidate, the standard billion-scale trick (IVF-ADC).
    * Exact re-ranking of the ADC top-(k·refine) restores precision.
    */
  def adcSearch(corpus: DataFrame, queries: DataFrame, cb: Codebooks,
                k: Int, refine: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    val coded = corpus
      .select(col("vec_id").cast("long"), col("embedding").cast(ArrayType(DoubleType)))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val c = bc.value
        it.map { case (id, v) => (id, encode(c, v.toArray).toSeq) }
      }.toDF("vec_id", "codes")

    val qRows = queries
      .select(col("vec_id").cast("long"), col("embedding").cast(ArrayType(DoubleType)))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val bq = spark.sparkContext.broadcast(qRows)

    val nCand = k * refine
    val partials = coded.as[(Long, Seq[Int])].mapPartitions { it =>
      val c = bc.value
      val qs = bq.value
      // per-query LUT: lut(q)(s)(code) = ‖q_sub − centroid‖²
      val luts = qs.map { case (_, qv) =>
        Array.tabulate(c.m, c.books(0).length) { (s, code) =>
          val ctr = c.books(s)(code)
          var d = 0.0; var i = 0
          while (i < c.subDim) {
            val df = qv(s * c.subDim + i) - ctr(i); d += df * df; i += 1
          }
          d
        }
      }
      // max-heap on (distance, id): head is the worst kept candidate
      val heaps = Array.fill(qs.length)(new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)))
      it.foreach { case (id, codes) =>
        var qi = 0
        while (qi < qs.length) {
          val lut = luts(qi)
          var d = 0.0; var s = 0
          while (s < c.m) { d += lut(s)(codes(s)); s += 1 }
          val h = heaps(qi)
          if (h.size < nCand) h.enqueue((d, id))
          else {
            val (wd, wid) = h.head
            if (d < wd || (d == wd && id < wid)) { h.dequeue(); h.enqueue((d, id)) }
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (d, id) => (bq.value(qi)._1, id, d) }
      }
    }.toDF("qid", "vec_id", "adc_dist")

    // global ADC top-(k·refine), then exact cosine re-rank of survivors.
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("adc_dist").asc, col("vec_id").asc)
    val cand = partials.withColumn("r", row_number().over(wAdc)).filter(col("r") <= nCand)
      .select("qid", "vec_id")
    val scored = cand
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .join(queries.select(col("vec_id").as("qid"), col("embedding").as("qv")), "qid")
      .withColumn("score", graft.functions.VectorOps.cosineSim(col("embedding"), col("qv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "vec_id", "score", "rank")
      .orderBy("qid", "rank")
  }

  def pqAdcSearch(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val sample = emb.select(col("embedding").cast(ArrayType(DoubleType)))
      .limit(100000).collect().map(_.getSeq[Double](0).toArray)
    val cb = train(sample, m = 8, k = 16)
    adcSearch(emb, emb.filter(col("vec_id") < VectorSearch.NQueries), cb, VectorSearch.K)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("pq_codes" -> (pqCodes _),
      "pq_adc_search" -> (pqAdcSearch _))
  val oracles: Map[String, String] = Map.empty // k-means → spec'd in ProductQuantSpec
}
