package graft

import org.apache.spark.sql.functions._

import graft.operators.{HnswAnn, IvfIndex, ProductQuant, VectorSearch}

/** Edge cases for the round-3 operators. */
class Round3EdgeSpec extends SparkTestBase {
  import spark.implicits._

  test("NSW beam on tiny buckets (size 1-2) returns every member, no crash") {
    val tiny = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val res = HnswAnn.hnswSearch(tiny, tiny.filter($"vec_id" === 0L), k = 3,
      nlist = 2, nprobe = 2)
    val got = res.select($"vec_id").as[Long].collect().toSet
    assert(got == Set(0L, 1L, 2L), got.toString) // both buckets probed, all found
    assert(res.filter($"rank" === 1).select($"vec_id").as[Long].head() == 0L)
  }

  test("pq_adc_refine depth stays within [k, k*MaxRefineFactor]") {
    val df = ProductQuant.pqAdcRefine(spark, sfDir)
    val depths = df.select($"qid", $"n_refined").distinct()
      .as[(Long, Int)].collect().toMap
    assert(depths.size == VectorSearch.NQueries)
    depths.values.foreach { d =>
      assert(d >= VectorSearch.K && d <= VectorSearch.K * ProductQuant.MaxRefineFactor,
        s"refine depth $d out of bounds")
    }
  }

  test("vector_avg of a single-member group equals the vector itself") {
    val one = Seq((7L, Seq(0.25f, -0.5f, 0.125f), 3)).toDF("vec_id", "embedding", "label")
    val got = one.groupBy("label")
      .agg(graft.functions.VectorAggOps.vectorAvg($"embedding").as("m"))
      .select($"m").as[Seq[Double]].head()
    assert(got == Seq(0.25, -0.5, 0.125))
  }

  test("compacting an already-compacted layout is a fixpoint") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(IvfIndex.trainSample(emb), 8, 10)
    val d1 = java.nio.file.Files.createTempDirectory("graft_fix1").toString
    IvfIndex.assign(emb, centroids)
      .write.partitionBy("centroid").mode("overwrite").parquet(d1)
    val d2 = java.nio.file.Files.createTempDirectory("graft_fix2").toString
    val d3 = java.nio.file.Files.createTempDirectory("graft_fix3").toString
    IvfIndex.compactIndex(spark, d1, d2)
    IvfIndex.compactIndex(spark, d2, d3)
    def rows(p: String) = spark.read.parquet(p).select($"vec_id", $"centroid")
      .as[(Long, Int)].collect().sorted.toSeq
    assert(rows(d2) == rows(d3))
    def nFiles(p: String) = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(p))
    }
    assert(nFiles(d2) == nFiles(d3))
  }
}
