package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamingDedup

/** Incremental LSH dedup over a document stream converges to the batch
  * candidate/verified sets regardless of arrival order. */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("stateful LSH buckets emit exactly the batch candidate pairs; verified == batch") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sfDir, "documents")

    // batch reference: the verified near-dup pairs
    val batchPairs = Dedup.dedupMinhashLsh(spark, sfDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet

    // batch candidate set (pre-verify) for the same corpus
    val hits = StreamingDedup.bandHits(docs, "doc_id", "text")
      .as[StreamingDedup.BandHit].collect()
    // no bucket may exceed the cap, or incremental/batch semantics split
    val maxBucket = hits.groupBy(_.bucket).values.map(_.size).max
    assert(maxBucket < Dedup.MaxBucketSize, s"bucket of $maxBucket hits cap")

    val input = MemoryStream[StreamingDedup.BandHit]
    val out = StreamingDedup.candidatePairs(input.toDS())
    val q = out.writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    // adversarial replay: interleave buckets across three chunks
    val chunks = hits.sortBy(h => (h.doc_id % 3, h.bucket)).grouped(hits.length / 3 + 1).toSeq
    chunks.foreach { c => input.addData(c.toSeq: _*); q.processAllAvailable() }
    q.stop()

    val streamed = spark.table("stream_dedup")
      .as[StreamingDedup.Pair].collect().map(p => (p.doc_a, p.doc_b)).toSet

    // verify streamed candidates by exact jaccard — equals the batch output
    val base = docs.select($"doc_id", Dedup.shingleHashes3($"text").as("sh"))
    val cand = streamed.toSeq.toDF("doc_a", "doc_b")
    val verified = broadcast(cand)
      .join(base.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
      .join(base.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
      .withColumn("jaccard", graft.functions.JaccardOps.sortedJaccard($"sh_a", $"sh_b"))
      .filter($"jaccard" >= Dedup.JaccardThreshold)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(verified == batchPairs,
      s"streamed-verified ${verified.size} pairs != batch ${batchPairs.size}")
  }
}
