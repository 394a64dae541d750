package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming WRITE path: incremental ingest lands in the same
  * centroid-partitioned parquet layout the batch index uses, and the
  * result is indistinguishable from a batch build — the end-to-end
  * story of stream_ingest (vectors arrive → centroid-routed → at-rest
  * index files that probe with partition pruning). */
class StreamingSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed vectors land in the partitioned index layout == batch build") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, sfDir, "embeddings")
    val sample = emb.select($"embedding".cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val centroids = operators.IvfIndex.trainCentroids(sample, 8, 10)

    val rows = emb.select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()

    val out = Files.createTempDirectory("graft_stream_sink").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double])]
    val assigned = operators.IvfIndex.assign(
      input.toDF().toDF("vec_id", "embedding"), centroids)
    val q = assigned.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .partitionBy("centroid").outputMode("append").start()
    val (a, b) = rows.splitAt(rows.length / 2)
    input.addData(a.toSeq: _*); q.processAllAvailable()
    input.addData(b.toSeq: _*); q.processAllAvailable()
    q.stop()

    val loaded = spark.read.parquet(out)
    assert(loaded.count() == emb.count())
    // identical (vec_id → centroid) assignment as the batch build
    val streamed = loaded.select($"vec_id", $"centroid")
      .as[(Long, Int)].collect().toMap
    val batch = operators.IvfIndex.assign(emb, centroids)
      .select($"vec_id", $"centroid").as[(Long, Int)].collect().toMap
    assert(streamed == batch)
    // and the layout prunes: a single-bucket probe reads one partition
    val probed = loaded.filter($"centroid" === 3)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(800))
    assert(probed.count() == batch.count(_._2 == 3))
  }

  test("checkpoint recovery: a restarted ingest query neither loses nor duplicates rows") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, sfDir, "embeddings")
    val sample = emb.select($"embedding".cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val centroids = operators.IvfIndex.trainCentroids(sample, 8, 10)
    val rows = emb.select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()

    val out = Files.createTempDirectory("graft_recover_sink").toString
    val ckpt = Files.createTempDirectory("graft_recover_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double])]
    def start() = operators.IvfIndex.assign(
        input.toDF().toDF("vec_id", "embedding"), centroids)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .partitionBy("centroid").outputMode("append").start()

    val (a, b) = rows.splitAt(rows.length / 2)
    val q1 = start()
    input.addData(a.toSeq: _*); q1.processAllAvailable()
    q1.stop() // simulated failure/restart boundary

    val q2 = start() // SAME checkpoint: resumes committed offsets
    input.addData(b.toSeq: _*); q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(out).select($"vec_id").as[Long].collect().sorted
    assert(got.length == rows.length, s"lost/duplicated: ${got.length} vs ${rows.length}")
    assert(got.toSeq == rows.map(_._1).sorted.toSeq)
  }
}
