package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{StreamingDedup, StreamingTopK}

/** Disk-spillable streaming state: the same stateful pipelines
  * (stream_dedup's LSH bucket membership, stream_topk's per-query
  * heaps) run under the RocksDB state store provider — the config a
  * cluster uses when keyed state outgrows executor heap (bucket-scale
  * dedup state at 100 TB) — and produce byte-identical results to the
  * default in-memory provider. State correctness must not depend on
  * the store backend. */
class RocksDbStateSpec extends SparkTestBase {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](f: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("LSH dedup bucket state under RocksDB equals the default provider") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sfDir, "documents")
    val hits = StreamingDedup.bandHits(docs, "doc_id", "text")
      .as[StreamingDedup.BandHit].collect()
      .sortBy(h => (h.doc_id % 3, h.bucket))
    val chunks = hits.grouped(hits.length / 3 + 1).toSeq

    def run(name: String): Set[(Long, Long)] = {
      val input = MemoryStream[StreamingDedup.BandHit]
      val q = StreamingDedup.candidatePairs(input.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      chunks.foreach { c => input.addData(c.toSeq: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[StreamingDedup.Pair].collect()
        .map(p => (p.doc_a, p.doc_b)).toSet
    }

    val default = run("rocks_cmp_default")
    val rocks = withRocksDb { run("rocks_cmp_rocksdb") }
    assert(rocks == default, s"rocksdb=${rocks.size} default=${default.size}")
    assert(rocks.nonEmpty)
  }

  test("continuous top-k state under RocksDB converges to batch kNN") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().map { case (id, v) => (id, v.toArray) }
    val all = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()

    val emitted = withRocksDb {
      val input = MemoryStream[(Long, Seq[Double])]
      val q = StreamingTopK.run(input.toDS(), queries, 5)
        .writeStream.format("memory").queryName("rocks_topk")
        .outputMode("update").start()
      val (h1, h2) = all.splitAt(all.length / 2)
      input.addData(h1.toSeq: _*); q.processAllAvailable()
      input.addData(h2.toSeq: _*); q.processAllAvailable()
      q.stop()
      spark.table("rocks_topk").filter($"seen" === all.length)
        .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    }
    val batch = graft.operators.Knn.topK(emb, emb.filter($"vec_id" < 3), 5)
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(emitted == batch, s"missing: ${(batch -- emitted).take(5)}")
  }
}
