package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.Tables
import graft.functions.TextHash

/** Linear projection layer with L2 normalization (reference:
  * src/embedders/projection.py ProjectionLayer.forward — y =
  * normalize(W·x)). The reference's W is learned; model training is
  * out of scope here, so W is a fixed deterministic pseudo-random
  * matrix — the operator semantics (matmul + normalize, batched,
  * distributed) are what is re-expressed.
  *
  * Bit-exact oracle: both the Catalyst expression tree and the DuckDB
  * SQL are generated from the SAME Double weights as left-associated
  * sums, so the unrolled matmul reproduces exactly.
  */
object Projection {
  val InDim = 64
  val OutDim = 8

  /** W[j][i] ∈ [-1, 1), splitmix64-derived, no RNG state. */
  def w(j: Int, i: Int): Double =
    (TextHash.mix64(j.toLong * 131071L + i.toLong) >>> 11) / 9007199254740992.0 * 2.0 - 1.0

  /** y_j = Σ_i W[j][i]·x_i as a left-associated Catalyst sum. */
  private def proj(embD: Column, j: Int): Column =
    (0 until InDim).map(i => element_at(embD, i + 1) * lit(w(j, i))).reduceLeft(_ + _)

  def projectionDf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val embD = col("embedding").cast(ArrayType(DoubleType))
    val projected = emb.select(
      (col("vec_id") +: (0 until OutDim).map(j => proj(embD, j).as(s"p$j"))): _*)
    val norm = sqrt((0 until OutDim).map(j => col(s"p$j") * col(s"p$j")).reduceLeft(_ + _))
    projected.select(
      (col("vec_id") +: (0 until OutDim).map(j => (col(s"p$j") / norm).as(s"y$j"))): _*)
      .orderBy("vec_id")
  }

  val projectionSql: String = {
    def projSql(j: Int): String =
      (0 until InDim)
        .map(i => s"CAST(embedding[${i + 1}] AS DOUBLE)*${graft.OracleSql.dlit(w(j, i))}")
        .mkString("(", " + ", ")")
    val ps = (0 until OutDim).map(j => s"${projSql(j)} AS p$j").mkString(",\n  ")
    val normSql = (0 until OutDim).map(j => s"p$j*p$j").mkString("sqrt(", " + ", ")")
    val ys = (0 until OutDim).map(j => s"p$j/$normSql AS y$j").mkString(",\n ")
    s"""SELECT vec_id,
       | $ys
       |FROM (SELECT vec_id,
       |  $ps
       | FROM embeddings)
       |ORDER BY vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("projection" -> (projectionDf _))
  val oracles: Map[String, String] =
    Map("projection" -> projectionSql)
}
