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

  /** Z-ORDER (Morton-interleaved) multi-dimensional layout for the
    * events table — the at-rest clustering that makes BOTH
    * `user_id`-sliced and time-sliced scans prune, where a single-column
    * sort can only serve one (Morton 1966; the standard multi-dim
    * data-skipping layout in modern lakehouse table formats).
    *
    * Both dimensions normalize to 8 bits by exact integer arithmetic
    * against the corpus extremes (`(v − min)·256 div (span+1)` — one
    * tiny aggregate, embedded as literals and re-derived by the twin),
    * the two bytes bit-interleave into a 16-bit z-value with the
    * classic spread-shift cascade (all shiftleft/&/| — whole-stage
    * codegen, zero UDF), and the write range-partitions + sorts by z:
    * every file then covers a small square of (user, time) space, so
    * parquet min/max stats on the NATURAL columns prune 2-D slices —
    * ZorderSpec pins per-file spans bounded in BOTH dims
    * simultaneously vs a ts-sorted layout whose files span all users.
    * The graded query reads a 2-D slice (middle user band × middle
    * time band) back off the layout and must reproduce the raw-table
    * aggregate INCLUDING a sum-of-z checksum — the Morton arithmetic
    * itself grades bit-exactly. At 100 TB: z-write is one range
    * exchange (same cost as any sorted write), and every mixed-
    * predicate scan after it skips (1 − slice area) of the files. */
  val Z0 = 64; val Z1 = 127       // graded user-band (u8 units)
  val T0 = 96; val T1 = 191       // graded time-band (t8 units)

  /** 8-bit Morton spread as an expression string: `shl` renders the
    * engine's shift-left (Spark `shiftleft(x, n)`, DuckDB `(x << n)`). */
  private def spread8(x: String, shl: (String, Int) => String): String = {
    val a = s"((${shl(x, 4)} | $x) & 3855)"   // 0x0F0F
    val b = s"((${shl(a, 2)} | $a) & 13107)"  // 0x3333
    s"((${shl(b, 1)} | $b) & 21845)"          // 0x5555
  }
  private def sparkShl(x: String, n: Int) = s"shiftleft($x, $n)"
  private def duckShl(x: String, n: Int) = s"($x << $n)"

  /** The operator's Morton-interleave as a Spark SQL expression over
    * two 8-bit column refs (shared with ZorderSpec). */
  private[graft] def zorderExprSql(u8: String, t8: String): String =
    s"(${spread8(u8, sparkShl)} | ${sparkShl(spread8(t8, sparkShl), 1)})"

  def eventsZorder(s: SparkSession, dir: String): DataFrame =
    graft.Mat.withScratchDirs("events_zorder") { case Seq(out) =>
      val ev = Tables.load(s, dir, "events")
      val r = ev.agg(min("ts"), max("ts"), min("user_id"), max("user_id")).first()
      val (ts0, ts1, u0, u1) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val u8 = s"(((user_id - $u0) * 256) div ${u1 - u0 + 1})"
      val t8 = s"(((ts - ${ts0}L) * 256) div ${ts1 - ts0 + 1})"
      val z = zorderExprSql("u8", "t8")
      ev.withColumn("u8", expr(u8)).withColumn("t8", expr(t8))
        .withColumn("z", expr(z))
        .repartitionByRange(16, col("z"))
        .sortWithinPartitions("z")
        .write.mode("overwrite").parquet(out)
      graft.Mat.detach(
        s.read.parquet(out)
          .filter(col("u8").between(Z0, Z1) && col("t8").between(T0, T1))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(round(col("value") * 100).cast("long")).as("sum_value_cents"),
            sum(col("z")).as("sum_z"))
          .orderBy("event_type"))
    }

  val eventsZorderSql: String = {
    val u8 = "(((user_id - b.u0) * 256) // (b.u1 - b.u0 + 1))"
    val t8 = "(((epoch_ns(ts) - b.ts0) * 256) // (b.ts1 - b.ts0 + 1))"
    val z = s"(${spread8("u8", duckShl)} | ${duckShl(spread8("t8", duckShl), 1)})"
    s"""WITH b AS (SELECT min(epoch_ns(ts)) AS ts0, max(epoch_ns(ts)) AS ts1,
       |                  min(user_id) AS u0, max(user_id) AS u1 FROM events),
       |e AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS vc,
       |             $u8 AS u8, $t8 AS t8
       |      FROM events, b),
       |ez AS (SELECT event_type, vc, u8, t8, $z AS z FROM e)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(vc) AS BIGINT) AS sum_value_cents,
       |       CAST(sum(z) AS BIGINT) AS sum_z
       |FROM ez WHERE u8 BETWEEN $Z0 AND $Z1 AND t8 BETWEEN $T0 AND $T1
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Z-layout compaction: ingest appends land as unclustered files
    * (a streaming sink or batch append can't globally re-sort), which
    * erodes the per-file 2-D bounds the slice-pruning rides on;
    * compaction re-range-partitions the WHOLE layout by the stored z
    * column into a fresh generation (new directory — the immutable-
    * generation swap protocol every other layout lifecycle here uses),
    * restoring bounded files without re-deriving z. At 100 TB this is
    * the periodic clustering maintenance every Z-ordered lakehouse
    * table schedules; cost is one range exchange over the touched
    * data. ZorderSpec pins the degrade→compact→restored-pruning cycle
    * with row fidelity. */
  def compactZorder(s: SparkSession, src: String, dst: String, files: Int = 16): Unit =
    s.read.parquet(src)
      .repartitionByRange(files, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(dst)

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
    "events_zorder" -> (eventsZorder _),
    "vectorgen_source" -> (vectorgenSource _))
  val oracles: Map[String, String] = Map(
    "events_layout" -> eventsLayoutSql,
    "events_zorder" -> eventsZorderSql,
    "vectorgen_source" -> vectorgenSourceSql)
}
