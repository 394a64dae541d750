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
        (id, codes.toSeq, math.sqrt(err), (v.length * 4.0) / bc.value.m)
      }
      .toDF("vec_id", "codes", "recon_err", "compression_ratio")
      .orderBy("vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("pq_codes" -> (pqCodes _))
  val oracles: Map[String, String] = Map.empty // k-means → spec'd in ProductQuantSpec
}
