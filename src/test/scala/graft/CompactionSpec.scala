package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** Compaction for the incremental index layout: streamed ingest lands
  * one file per trigger × task × bucket; compactIndex rewrites the
  * layout to one file per bucket with rows preserved bit-exactly and
  * partition pruning intact. */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  test("compacted streamed-ingest layout: fewer files, identical rows, still prunes") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(IvfIndex.trainSample(emb), 8, 10)
    val rows = emb.select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()

    val out = Files.createTempDirectory("graft_compact_sink").toString
    val ckpt = Files.createTempDirectory("graft_compact_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double])]
    val q = IvfIndex.assign(input.toDF().toDF("vec_id", "embedding"), centroids)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .partitionBy("centroid").outputMode("append").start()
    // three triggers → three file generations per bucket
    rows.grouped(rows.length / 3 + 1).foreach { c =>
      input.addData(c.toSeq: _*); q.processAllAvailable()
    }
    q.stop()

    def parquetFiles(root: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(root))
    }
    val before = parquetFiles(out).size
    assert(before > 8, s"expected >1 file per bucket pre-compaction, got $before")

    val compacted = Files.createTempDirectory("graft_compact_out").toString
    IvfIndex.compactIndex(spark, out, compacted)
    val after = parquetFiles(compacted).size
    assert(after == 8, s"expected exactly one file per bucket, got $after")

    // bit-identical content
    val a = spark.read.parquet(out).select($"vec_id", $"centroid")
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    val b = spark.read.parquet(compacted).select($"vec_id", $"centroid")
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(a == b)

    // probes still prune to the bucket directory
    val probed = spark.read.parquet(compacted).filter($"centroid" === 3)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(800))
    assert(probed.count() == a.count(_._2 == 3))
  }

  /** Compact-while-ingesting: compaction runs on a SNAPSHOT of the
    * committed file set while the stream keeps appending new files to
    * the same layout — the protocol a 100 TB index needs, since ingest
    * never pauses. Snapshot isolation makes the race benign: the
    * compactor only ever reads files committed before T, the stream
    * only ever adds files after T, so compacted ∪ delta is exactly the
    * full row set regardless of interleaving — no loss, no
    * duplication, pruning intact on both sides of the union. */
  test("compaction concurrent with live ingest: snapshot + delta view loses nothing, duplicates nothing") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(IvfIndex.trainSample(emb), 8, 10)
    val rows = emb.select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()

    def parquetFiles(root: String): Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(root)).map(_.getAbsolutePath)
    }

    val out = Files.createTempDirectory("graft_ci_sink").toString
    val ckpt = Files.createTempDirectory("graft_ci_ckpt").toString
    val compacted = Files.createTempDirectory("graft_ci_compact").toString
    val input = MemoryStream[(Long, Seq[Double])]
    val q = IvfIndex.assign(input.toDF().toDF("vec_id", "embedding"), centroids)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .partitionBy("centroid").outputMode("append").start()
    try {
      val chunks = rows.grouped(rows.length / 3 + 1).toSeq
      // triggers 1+2 commit, then SNAPSHOT the committed file set
      chunks.take(2).foreach { c => input.addData(c.toSeq: _*); q.processAllAvailable() }
      val snapshot = parquetFiles(out)
      assert(snapshot.nonEmpty)

      // compaction of the snapshot races trigger 3's appends
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      val compactJob = Future {
        spark.read.option("basePath", out).parquet(snapshot: _*)
          .repartition(col("centroid"))
          .write.partitionBy("centroid").mode("overwrite").parquet(compacted)
      }
      chunks.drop(2).foreach { c => input.addData(c.toSeq: _*); q.processAllAvailable() }
      Await.result(compactJob, scala.concurrent.duration.Duration(120, "s"))

      // live view after the swap: compacted snapshot ∪ post-snapshot delta
      val delta = parquetFiles(out).filterNot(snapshot.toSet)
      val live =
        if (delta.isEmpty) spark.read.parquet(compacted)
        else spark.read.parquet(compacted).unionByName(
          spark.read.option("basePath", out).parquet(delta: _*))
      val got = live.select($"vec_id", $"centroid".cast("int"))
        .as[(Long, Int)].collect().sortBy(_._1).toSeq
      val want = IvfIndex.assign(emb, centroids)
        .select($"vec_id", $"centroid")
        .as[(Long, Int)].collect().sortBy(_._1).toSeq
      assert(delta.nonEmpty, "trigger 3 committed no files — the race never happened")
      assert(got == want, "snapshot-compaction + delta view lost or duplicated rows")

      // compacted side: one file per bucket; pruning intact
      assert(parquetFiles(compacted).size ==
        spark.read.parquet(compacted).select("centroid").distinct().count())
      val plan = spark.read.parquet(compacted).filter($"centroid" === 3)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"), plan.take(800))
    } finally q.stop()
  }
}
