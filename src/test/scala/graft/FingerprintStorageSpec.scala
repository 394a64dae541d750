package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.functions.WinnowHashArr
import graft.operators.{IvfIndex, Knn}
import org.apache.spark.unsafe.types.UTF8String

class FingerprintStorageSpec extends SparkTestBase {
  import spark.implicits._

  def fp(s: String) = WinnowHashArr.fingerprints(UTF8String.fromString(s), 5, 4).toSet

  test("winnowing: identical text → identical fingerprints; near-dup shares most") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = a.replace("lazy", "hazy")
    val c = "completely different content with no overlap whatsoever in the corpus"
    assert(fp(a) == fp(a))
    val shared = fp(a).intersect(fp(b)).size.toDouble / fp(a).union(fp(b)).size
    assert(shared > 0.5, s"near-dup shares only $shared")
    val far = fp(a).intersect(fp(c)).size.toDouble / fp(a).union(fp(c)).size
    assert(far < shared)
  }

  test("winnowing guarantees: every window of w k-grams contributes a min") {
    // short text smaller than k → single whole-text hash
    assert(fp("ab").size == 1)
    // deterministic
    val t = "abcdefghijklmnop"
    assert(fp(t) == fp(t))
  }

  test("IVF index save/load roundtrip with partition-pruned probes") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val sample = emb.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val centroids = IvfIndex.trainCentroids(sample, 8, 10)
    val assigned = IvfIndex.assign(emb, centroids)

    val dir = Files.createTempDirectory("graft_ivf").toString
    assigned.write.partitionBy("centroid").mode("overwrite").parquet(dir)

    val loaded = spark.read.parquet(dir)
    assert(loaded.count() == emb.count())

    // probe two buckets: physical plan must prune partitions
    val probed = loaded.filter(col("centroid").isin(0, 1))
    val explained = probed.queryExecution.executedPlan.toString
    assert(explained.contains("PartitionFilters") &&
      explained.contains("centroid"), s"no partition pruning in:\n$explained")
    // pruned read returns exactly the assigned members
    val expect = assigned.filter(col("centroid").isin(0, 1)).count()
    assert(probed.count() == expect)

    // reloaded index serves the same k-NN results as the in-memory one
    val q = emb.filter(col("vec_id") < 3)
    val fromLoaded = Knn.topK(
      loaded.select(col("vec_id"), col("embedding")), q, 5, Knn.Cosine)
      .select($"qid", $"rank", $"vec_id").as[(Long, Int, Long)].collect().toSet
    val fromMem = Knn.topK(emb, q, 5, Knn.Cosine)
      .select($"qid", $"rank", $"vec_id").as[(Long, Int, Long)].collect().toSet
    assert(fromLoaded == fromMem)
  }
}
