package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{OracleSql, Tables}

/** Graded at-rest-layout queries — the two layout claims that were
  * previously spec-only now carry the hard oracle signal:
  *
  *  - events_layout: the day-partitioned events layout, read back
  *    through a partition-pruned time-range scan, aggregates to
  *    exactly what the unpartitioned table says (the pruning itself —
  *    PartitionFilters on `day` — is pinned in EventsLayoutSpec).
  *  - vectorgen_source: the DSv2 generated corpus (md5 basis) is
  *    value-level reproducible in pure SQL — the oracle recomputes
  *    every sampled component and the full self-dot checksum from
  *    md5_number_lower("id:i"), proving the connector's pushed-down
  *    range scan generates exactly the declared rows.
  */
object LayoutQueries {
  /** Day-partitioned write → pruned read → aggregate; equals the
    * unpartitioned scan. Day = exact integer ns→day division (positive
    * clocks: truncation == floor on both engines). */
  def eventsLayout(s: SparkSession, dir: String): DataFrame =
    graft.Mat.withScratchDirs("events_layout") { case Seq(out) =>
      val ev = Tables.load(s, dir, "events")
        .withColumn("day", expr("ts div 86400000000000"))
      ev.write.partitionBy("day").mode("overwrite").parquet(out)
      // partition columns are inference-typed on read — pin to long
      val loaded = s.read.parquet(out).withColumn("day", col("day").cast("long"))
      val d0 = ev.agg(min(col("day"))).first().getLong(0)
      graft.Mat.detach(
        loaded.filter(col("day").between(d0, d0 + 2))
          .groupBy("day", "event_type")
          .agg(count(lit(1)).as("n"),
            sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
          .orderBy("day", "event_type"))
    }

  val eventsLayoutSql: String =
    """WITH e AS (SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
      |                  event_type, CAST(round(value*100) AS BIGINT) AS vc
      |           FROM events),
      |b AS (SELECT min(day) AS d0 FROM e)
      |SELECT day, event_type, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(vc) AS BIGINT) AS sum_value_cents
      |FROM e, b WHERE day BETWEEN b.d0 AND b.d0 + 2
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** DSv2 generated corpus, md5 basis, vec_id range pushed into the
    * generator; sampled components + full self-dot checksum per row. */
  val VecGenN = 2000
  val VecGenTake = 300
  def vectorgenSource(s: SparkSession, dir: String): DataFrame = {
    val df = s.read.format("graft.sources.VectorGen")
      .option("n", VecGenN.toString).option("dim", "64")
      .option("partitions", "8").option("basis", "md5").load()
      .filter(col("vec_id") < VecGenTake)
    df.select(col("vec_id"), col("label"),
        element_at(col("embedding"), 1).as("c0"),
        element_at(col("embedding"), 32).as("c31"),
        element_at(col("embedding"), 64).as("c63"),
        graft.functions.VectorOps.dot(col("embedding"), col("embedding")).as("checksum"))
      .orderBy("vec_id")
  }

  val vectorgenSourceSql: String = {
    val comp = // REAL-cast component i (0-based) of row vec_id
      """CAST(CAST((md5_number_lower(vec_id::VARCHAR || ':' || i::VARCHAR) >> 11) AS DOUBLE)
        |      / 9007199254740992e0 * 2e0 - 1e0 AS REAL)""".stripMargin
    s"""WITH g AS (SELECT r.range AS vec_id FROM range(0, $VecGenTake) r),
       |e AS (SELECT vec_id,
       |        list_transform(range(0, 64), i -> $comp) AS emb
       |      FROM g)
       |SELECT vec_id, CAST(vec_id % 10 AS INT) AS label,
       |  emb[1] AS c0, emb[32] AS c31, emb[64] AS c63,
       |  ${OracleSql.dot("emb", "emb")} AS checksum
       |FROM e ORDER BY vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_layout" -> (eventsLayout _),
    "vectorgen_source" -> (vectorgenSource _))
  val oracles: Map[String, String] = Map(
    "events_layout" -> eventsLayoutSql,
    "vectorgen_source" -> vectorgenSourceSql)
}
