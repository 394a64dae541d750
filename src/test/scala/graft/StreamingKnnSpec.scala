package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Streaming similarity surfaces: a stream of query vectors scored
  * against the static corpus (stream-static join — the online-serving
  * shape of the batch search_batch path). */
class StreamingKnnSpec extends SparkTestBase {
  import spark.implicits._

  test("stream-static cosine similarity join finds self-matches") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, sfDir, "embeddings")
    val qvecs = emb.filter($"vec_id" < 5)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()

    val input = MemoryStream[(Long, Seq[Float])]
    val stream = input.toDF().toDF("qid", "qv")
    val joined = stream.join(emb,
        VectorOps.cosineSim($"qv", $"embedding") >= 0.99)
      .select($"qid", $"vec_id")
    val q = joined.writeStream.format("memory").queryName("stream_knn")
      .outputMode("append").start()
    input.addData(qvecs.toSeq: _*)
    q.processAllAvailable()

    val got = spark.table("stream_knn").as[(Long, Long)].collect().toSet
    // each streamed query matches (at least) itself at cosine 1.0
    assert((0L until 5L).forall(i => got.contains((i, i))), got.toString)
    q.stop()
  }

  test("incremental ingest: streamed vectors route to their IVF bucket") {
    // The streaming form of the reference's add_vectors: new vectors
    // arrive, get centroid-assigned (broadcast centroids via the
    // codegen expression), and land in the partitioned index layout.
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, sfDir, "embeddings")
    val sample = emb.select($"embedding".cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val centroids = graft.operators.IvfIndex.trainCentroids(sample, 8, 10)

    val input = MemoryStream[(Long, Seq[Double])]
    val assigned = graft.operators.IvfIndex.assign(
      input.toDF().toDF("vec_id", "embedding"), centroids)
    val q = assigned.writeStream.format("memory").queryName("ivf_ingest")
      .outputMode("append").start()

    val newVecs = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    input.addData(newVecs.toSeq: _*)
    q.processAllAvailable()

    val got = spark.table("ivf_ingest")
      .select($"vec_id", $"centroid").as[(Long, Int)].collect().toMap
    assert(got.size == 20)
    // assignments match the batch operator exactly
    val batch = graft.operators.IvfIndex.assign(emb.filter($"vec_id" < 20), centroids)
      .select($"vec_id", $"centroid").as[(Long, Int)].collect().toMap
    assert(got == batch)
    q.stop()
  }

  test("continuous top-k state converges to the batch kNN result") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().map { case (id, v) => (id, v.toArray) }

    val all = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()

    val input = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.StreamingTopK.run(input.toDS(), queries, 5)
      .writeStream.format("memory").queryName("cont_topk")
      .outputMode("update").start()
    // stream the corpus in two arrivals
    val (half1, half2) = all.splitAt(all.length / 2)
    input.addData(half1.toSeq: _*); q.processAllAvailable()
    input.addData(half2.toSeq: _*); q.processAllAvailable()

    // the final batch emitted the converged top-k: every batch-exact
    // (qid, vec_id, rank) triple must appear in the update stream
    val emitted = spark.table("cont_topk")
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val batch = graft.operators.Knn.topK(emb, emb.filter($"vec_id" < 3), 5)
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(batch.subsetOf(emitted),
      s"missing: ${(batch -- emitted).take(5)}")
    q.stop()
  }

  test("salted near-dup join equals the unsalted one") {
    val plain = graft.operators.TextOps.dedupEmbedding(spark, sfDir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    val salted = graft.operators.TextOps.dedupEmbeddingSalted(spark, sfDir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("approx_count_distinct tracks the exact distinct within 5%") {
    val ev = Tables.load(spark, sfDir, "events")
    val both = ev.groupBy("event_type")
      .agg(countDistinct($"user_id").as("exact"),
        approx_count_distinct($"user_id").as("approx"))
      .as[(String, Long, Long)].collect()
    both.foreach { case (_, e, a) =>
      assert(math.abs(a - e).toDouble / e <= 0.05, s"exact=$e approx=$a")
    }
  }
}
