package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** The duplicate-id contract of the tombstone-aware shard merge
  * (IvfIndex.mergeShardsLww / indexMergeDelete): resolution is
  * last-writer-wins by shard sequence, exercised with OVERLAPPING
  * shards — same id upserted in both (conflicting payloads),
  * delete-then-reinsert, and reinsert-then-delete across shards. */
class Round6Spec extends SparkTestBase {
  import spark.implicits._

  private def shard(seqNo: Int, rows: (Long, Seq[Double], Int, String)*) =
    rows.toSeq.toDF("vec_id", "embedding", "centroid", "op")
      .withColumn("shard_seq", lit(seqNo))

  private val v0 = Seq(1.0, 0.0)
  private val v1 = Seq(0.0, 1.0)

  test("same id upserted in two shards: the later shard's payload wins, exactly once") {
    val a = shard(0, (1L, v0, 0, "upsert"), (2L, v0, 0, "upsert"))
    val b = shard(1, (1L, v1, 1, "upsert"))
    val merged = IvfIndex.mergeShardsLww(Seq(a, b))
      .select("vec_id", "embedding", "centroid")
      .as[(Long, Seq[Double], Int)].collect().sortBy(_._1)
    assert(merged.toSeq == Seq((1L, v1, 1), (2L, v0, 0)))
  }

  test("delete-then-reinsert across shards: the reinsert survives") {
    val a = shard(0, (1L, v0, 0, "delete"))
    val b = shard(1, (1L, v1, 1, "upsert"))
    val merged = IvfIndex.mergeShardsLww(Seq(a, b))
      .select("vec_id", "centroid").as[(Long, Int)].collect().toSeq
    assert(merged == Seq((1L, 1)))
  }

  test("reinsert-then-delete across shards: the id is gone") {
    val a = shard(0, (1L, v0, 0, "upsert"), (2L, v0, 0, "upsert"))
    val b = shard(1, (1L, v1, 1, "delete"))
    val merged = IvfIndex.mergeShardsLww(Seq(a, b))
      .select("vec_id").as[Long].collect().toSeq
    assert(merged == Seq(2L))
  }

  test("merged layout never holds duplicate ids under heavy overlap (disk round-trip)") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(IvfIndex.trainSample(emb), 8, 5)
    def shardDf(rows: org.apache.spark.sql.DataFrame, seqNo: Int) =
      IvfIndex.assign(rows, centroids)
        .withColumn("op",
          when(pmod(col("vec_id"), lit(IvfIndex.TombstoneMod)) === IvfIndex.TombstoneRes,
            lit("delete")).otherwise(lit("upsert")))
        .withColumn("shard_seq", lit(seqNo))
    Mat.withScratchDirs("r6_a", "r6_b", "r6_m") { case Seq(da, db, dm) =>
      // shard B re-upserts EVERY third row of shard A — 1/3 of the
      // even ids exist in both shards.
      shardDf(emb.filter(col("vec_id") % 2 === 0), 0)
        .write.partitionBy("centroid").mode("overwrite").parquet(da)
      shardDf(emb.filter(col("vec_id") % 2 === 1)
          .unionByName(emb.filter(col("vec_id") % 6 === 0)), 1)
        .write.partitionBy("centroid").mode("overwrite").parquet(db)
      IvfIndex.mergeShardsLww(Seq(spark.read.parquet(da), spark.read.parquet(db)))
        .repartition(col("centroid"))
        .write.partitionBy("centroid").mode("overwrite").parquet(dm)
      val merged = spark.read.parquet(dm)
      val nTotal = merged.count()
      val nIds = merged.select("vec_id").distinct().count()
      val expected = emb.filter(
        pmod(col("vec_id"), lit(IvfIndex.TombstoneMod)) =!= IvfIndex.TombstoneRes).count()
      assert(nTotal == nIds, "duplicate vec_ids in merged layout")
      assert(nTotal == expected, "row loss or tombstone leak in merged layout")
    }
  }
}
