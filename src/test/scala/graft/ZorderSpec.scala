package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.LayoutQueries

/** Z-order layout: the property that makes it worth a graded query —
  * files bound BOTH dimensions simultaneously, which no single-column
  * sort achieves — plus pushdown of the 2-D slice predicate.
  *
  * Statistic: the SHARE of files bounded in a dimension, not the max —
  * a z-range partition that crosses a high-order bit boundary of the
  * curve legitimately sweeps the other dimension (1–2 of 16 here), so
  * max-span is the wrong invariant; most-files-bounded is the one the
  * pruning benefit actually rides on. */
class ZorderSpec extends SparkTestBase {
  import spark.implicits._

  test("z-ordered files bound user AND time for most files; ts-sort never bounds users") {
    val ev = Tables.load(spark, sfDir, "events")
    val r = ev.agg(min("ts"), max("ts"), min("user_id"), max("user_id")).first()
    val (ts0, ts1, u0, u1) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val uSpan = u1 - u0; val tSpan = ts1 - ts0

    graft.Mat.withScratchDirs("zspec_z", "zspec_t") { case Seq(zd, td) =>
      // the z layout exactly as the graded operator writes it
      val u8 = s"(((user_id - $u0) * 256) div ${uSpan + 1})"
      val t8 = s"(((ts - ${ts0}L) * 256) div ${tSpan + 1})"
      ev.withColumn("u8", expr(u8)).withColumn("t8", expr(t8))
        .withColumn("z", expr(LayoutQueries.zorderExprSql("u8", "t8")))
        .repartitionByRange(16, col("z")).sortWithinPartitions("z")
        .write.mode("overwrite").parquet(zd)
      ev.repartitionByRange(16, col("ts")).sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(td)

      def boundedCounts(dir: String): (Long, Long, Long) = {
        val f = spark.read.parquet(dir).withColumn("f", input_file_name())
          .groupBy("f")
          .agg((max("user_id") - min("user_id")).as("us"),
            (max("ts") - min("ts")).as("tss"))
        (f.count(),
          f.filter(col("us") <= (uSpan * 6) / 10).count(),
          f.filter(col("tss") <= (tSpan * 6) / 10).count())
      }
      val (zn, zu, zt) = boundedCounts(zd)
      val (tn, tu, tt) = boundedCounts(td)
      assert(zn >= 16 && tn >= 16)
      // z: most files are bounded in BOTH dims simultaneously
      assert(zu * 10 >= zn * 8, s"only $zu of $zn z files bound users")
      assert(zt * 10 >= zn * 8, s"only $zt of $zn z files bound time")
      // ts sort: every file tight on time, NO file bounds users
      assert(tt == tn, s"ts-sorted files not time-tight: $tt of $tn")
      assert(tu == 0, s"single-column sort unexpectedly bounded users in $tu files")
    }
  }

  test("append erodes the z clustering; compaction restores bounded files, rows intact") {
    val ev = Tables.load(spark, sfDir, "events")
    val r = ev.agg(min("ts"), max("ts"), min("user_id"), max("user_id")).first()
    val (ts0, ts1, u0, u1) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val uSpan = u1 - u0
    val u8 = s"(((user_id - $u0) * 256) div ${uSpan + 1})"
    val t8 = s"(((ts - ${ts0}L) * 256) div ${ts1 - ts0 + 1})"
    val withZ = ev.withColumn("u8", expr(u8)).withColumn("t8", expr(t8))
      .withColumn("z", expr(LayoutQueries.zorderExprSql("u8", "t8")))
    val baseRows = withZ.filter(col("user_id") % 3 =!= 0)
    val appendRows = withZ.filter(col("user_id") % 3 === 0)

    graft.Mat.withScratchDirs("zspec_life", "zspec_life2") { case Seq(gen0, gen1) =>
      baseRows.repartitionByRange(16, col("z")).sortWithinPartitions("z")
        .write.mode("overwrite").parquet(gen0)
      // ingest append: unclustered (the sink can't re-sort the layout)
      appendRows.repartition(4).write.mode("append").parquet(gen0)
      def boundedShare(dir: String): (Long, Long) = {
        val f = spark.read.parquet(dir).withColumn("f", input_file_name())
          .groupBy("f").agg((max("user_id") - min("user_id")).as("us"))
        (f.count(), f.filter(col("us") <= (uSpan * 6) / 10).count())
      }
      val (n0, b0) = boundedShare(gen0)
      // the appended files span all users — the bounded share dropped
      assert(b0 < n0, s"append did not erode clustering: $b0 of $n0 bounded")
      LayoutQueries.compactZorder(spark, gen0, gen1)
      val (n1, b1) = boundedShare(gen1)
      assert(b1 * 10 >= n1 * 8, s"compaction did not restore bounds: $b1 of $n1")
      // row fidelity across the lifecycle
      assert(spark.read.parquet(gen1).count() == withZ.count())
    }
  }

  test("streamed z-ingest + compaction serves bit-equal to the batch z layout") {
    val streamed = graft.streaming.StreamingQueries.streamZorderIngest(spark, sfDir)
      .collect().toSeq
    val batch = LayoutQueries.eventsZorder(spark, sfDir).collect().toSeq
    assert(streamed == batch, "streamed-ingested z layout diverged from batch")
    assert(streamed.nonEmpty)
  }

  test("graded 2-D slice pushes both band predicates into the parquet scan") {
    val df = LayoutQueries.eventsZorder(spark, sfDir)
    assert(df.collect().nonEmpty)
    // the operator detaches (collects) its small result; re-derive the
    // scan shape to pin pushdown of the stored u8/t8 band filters
    graft.Mat.withScratchDirs("zspec_push") { case Seq(out) =>
      val ev = Tables.load(spark, sfDir, "events")
        .withColumn("u8", expr("user_id % 256")).withColumn("t8", expr("event_id % 256"))
      ev.write.mode("overwrite").parquet(out)
      val scan = spark.read.parquet(out)
        .filter(col("u8").between(LayoutQueries.Z0, LayoutQueries.Z1) &&
          col("t8").between(LayoutQueries.T0, LayoutQueries.T1))
        .queryExecution.executedPlan.collectFirst {
          case s: FileSourceScanExec => s.metadata("PushedFilters")
        }.getOrElse(fail("no parquet scan in plan"))
      for (want <- Seq(s"GreaterThanOrEqual(u8,${LayoutQueries.Z0})",
          s"LessThanOrEqual(u8,${LayoutQueries.Z1})",
          s"GreaterThanOrEqual(t8,${LayoutQueries.T0})",
          s"LessThanOrEqual(t8,${LayoutQueries.T1})"))
        assert(scan.contains(want), s"missing pushed filter $want in: $scan")
    }
  }
}
