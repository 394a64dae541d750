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
