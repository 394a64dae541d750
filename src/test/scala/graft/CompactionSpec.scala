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
}
