package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Knn}

/** Dev scale probe: exercises the vector operators on a synthetic
  * corpus ~500× the sf0.1 testdata (1M × 64-d) to sanity-check the
  * scan-throughput story on one node. Vectors derive from splitmix64
  * of the row id — no data files, fully deterministic.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    // optional probe filter: substrings of probe names to run
    val only = args.drop(1)
    def wanted(name: String): Boolean = only.isEmpty || only.exists(name.contains)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // the DSv2 source (graft.sources.VectorGen) generates the corpus —
    // same splitmix64 formula, read through the connector stack
    val corpus = spark.read.format("graft.sources.VectorGen")
      .option("n", n).option("dim", 64).option("partitions", 64).load()
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true) // materialize so timings measure the operator, not generation

    val queries = corpus.filter(col("vec_id") < 16)

    def time(name: String)(f: => Any): Unit = if (wanted(name)) {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $name: $s%.2f s (${n / s / 1e6}%.1f M rows/s)")
    }

    time("brute-force kNN k=10, 16 queries")(
      Knn.topK(corpus, queries, 10, Knn.Cosine).count())
    time("custom-plan kNN k=10, 16 queries")(
      graft.plans.VectorTopK.topK(corpus, queries, 10, Knn.Cosine).count())
    time("IVF build (nlist=64, sample 100k) + probe 4")(
      IvfIndex.search(corpus, queries, 10, nlist = 64, nprobe = 4)._1.count())
    time("PQ-ADC search (m=8, k=256, refine 4)")({
      val sample = corpus.selectExpr("cast(embedding as array<double>)")
        .limit(100000).collect().map(_.getSeq[Double](0).toArray)
      val cb = graft.operators.ProductQuant.train(sample, m = 8, k = 256)
      graft.operators.ProductQuant.adcSearch(corpus, queries, cb, 10).count()
    })
    time("IVF-PQ search (nlist=64, m=8, k=16, probe 4, refine 4)")({
      val sample = corpus.selectExpr("cast(embedding as array<double>)")
        .limit(100000).collect().map(_.getSeq[Double](0).toArray)
      val mdl = graft.operators.IvfPq.trainModel(sample, nlist = 64)
      graft.operators.IvfPq.search(corpus, queries, 10, mdl).count()
    })
    time("multiscale custom plan (scales 8/16/32/64, k=10, 16 queries, ONE pass)")(
      graft.operators.Multiscale.topKAllScales(corpus, queries, 10, Seq(8, 16, 32, 64)).count())
    time("multiscale baseline: 4 per-scale Dataset-mapPartitions passes")(
      Seq(8, 16, 32, 64).foreach { d =>
        val sl = corpus.select(col("vec_id"), slice(col("embedding"), 1, d).as("embedding"))
        Knn.topK(sl, sl.filter(col("vec_id") < 16), 10, Knn.Cosine).count()
      })
    time("per-bucket NSW graphs + IVF routing (nlist=64, probe 4)")(
      graft.operators.HnswAnn.hnswSearch(corpus, queries, 10, nlist = 64).count())
    time("PQ-ADC adaptive refine (m=8, k=16, alpha 0.25, cap k*8)")({
      val sample = corpus.selectExpr("cast(embedding as array<double>)")
        .limit(100000).collect().map(_.getSeq[Double](0).toArray)
      val cb = graft.operators.ProductQuant.train(sample, m = 8, k = 16)
      graft.operators.ProductQuant.adcSearchAdaptive(corpus, queries, cb, 10).count()
    })
    spark.stop()
  }
}
