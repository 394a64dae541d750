package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graded query for the `vector_avg` aggregate (VectorAvgAgg, the
  * distributed Lloyd-update primitive): elementwise mean of the
  * embedding column per label, exploded to (label, dim, avg_val) rows
  * (array cells can't be driver-hash-compared; scalars can).
  *
  * Bit-exactness across engines AND across partition counts needs a
  * DETERMINISTIC summation order — double addition is not associative.
  * The input is hash-repartitioned by the group key and sorted by
  * (label, vec_id) within partitions: each label then lives in exactly
  * one partition and its TypedImperativeAggregate buffer folds values
  * in ascending-vec_id order (no cross-partition merge for a group, so
  * merge order can't reorder the sum). The DuckDB twin replays the
  * identical left-assoc fold with a recursive CTE over
  * list(embedding ORDER BY vec_id).
  *
  * At scale this is exactly how you'd recompute IVF centroids from an
  * assigned corpus: one shuffle of (sum, count) partial buffers per
  * group — the deterministic-order variant costs one sort within the
  * already-shuffled partitions.
  */
object VectorAvg {
  def vectorAvg(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    emb.repartition(col("label"))
      .sortWithinPartitions("label", "vec_id")
      .groupBy("label")
      .agg(graft.functions.VectorAggOps.vectorAvg(col("embedding")).as("avg_vec"))
      .select(col("label"), posexplode(col("avg_vec")).as(Seq("dim", "avg_val")))
      .select(col("label"), col("dim").cast("int").as("dim"), col("avg_val"))
      .orderBy("label", "dim")
  }

  val vectorAvgSql: String =
    """WITH RECURSIVE g AS MATERIALIZED (
      |  SELECT label, list(embedding ORDER BY vec_id) AS vs, count(*) AS n
      |  FROM embeddings GROUP BY label),
      |it(label, i, acc) AS (
      |  SELECT label, 1, list_transform(vs[1], x -> CAST(x AS DOUBLE)) FROM g
      |  UNION ALL
      |  SELECT it.label, it.i + 1,
      |    list_transform(range(1, 65), j -> it.acc[j] + CAST(g.vs[it.i + 1][j] AS DOUBLE))
      |  FROM it JOIN g ON g.label = it.label
      |  WHERE it.i < g.n),
      |fin AS (SELECT it.label, it.acc, g.n FROM it JOIN g ON g.label = it.label
      |        WHERE it.i = g.n)
      |SELECT label, CAST(j AS INT) AS dim, acc[j+1] / n AS avg_val
      |FROM fin CROSS JOIN range(64) r(j)
      |ORDER BY label, dim""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("vector_avg" -> (vectorAvg _))
  val oracles: Map[String, String] = Map("vector_avg" -> vectorAvgSql)
}
