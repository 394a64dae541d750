package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Knn, Multiscale, TextOps, VectorSearch}

/** Round-5 operators: multi-scale matryoshka search, repetition-quality
  * filter, shard merge. */
class Round5Spec extends SparkTestBase {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("multiscale_search per scale equals an independent per-scale Knn.topK") {
    val got = Multiscale.topKAllScales(
      emb, emb.filter($"vec_id" < VectorSearch.NQueries), VectorSearch.K, Multiscale.Scales)
      .select($"dim", $"qid", $"vec_id", $"rank")
      .as[(Int, Long, Long, Int)].collect().toSet

    val expect = Multiscale.Scales.flatMap { d =>
      val sliced = emb.select($"vec_id", slice($"embedding", 1, d).as("embedding"))
      Knn.topK(sliced, sliced.filter($"vec_id" < VectorSearch.NQueries), VectorSearch.K, Knn.Cosine)
        .select(lit(d).as("dim"), $"qid", $"vec_id", $"rank")
        .as[(Int, Long, Long, Int)].collect()
    }.toSet

    assert(got == expect)
  }

  test("multiscale_search scores at dim 64 match knn_cosine bit-exactly") {
    val ms = Multiscale.multiscaleSearch(spark, sfDir)
      .filter($"dim" === 64).select($"qid", $"vec_id", $"score")
      .as[(Long, Long, Double)].collect().toSet
    val knn = VectorSearch.knn(Knn.Cosine)(spark, sfDir)
      .select($"qid", $"vec_id", $"score")
      .as[(Long, Long, Double)].collect().toSet
    assert(ms == knn)
  }

  test("multiscale_search is one corpus pass: deterministic across partition counts") {
    val a = Multiscale.topKAllScales(emb.repartition(2),
      emb.filter($"vec_id" < 5), 5, Multiscale.Scales).collect().map(_.toString)
    val b = Multiscale.topKAllScales(emb.repartition(13),
      emb.filter($"vec_id" < 5), 5, Multiscale.Scales).collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("text_repetition metrics are internally consistent") {
    val rows = TextOps.textRepetition(spark, sfDir)
      .select($"doc_id", $"n_tokens", $"ttr_ppm", $"dup3_ppm", $"top_ppm", $"keep")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, ttr, dup3, top, keep) =>
      assert(n > 0, s"doc $id")
      assert(ttr >= 0 && ttr <= 1000000, s"doc $id ttr=$ttr")
      assert(dup3 >= 0 && dup3 <= 1000000, s"doc $id dup3=$dup3")
      // top word can't be rarer than 1/n or more common than every token
      assert(top >= 1000000 / n && top <= 1000000, s"doc $id top=$top")
      val expectKeep = n >= TextOps.RepMinTokens && ttr >= TextOps.RepTtrMin &&
        top <= TextOps.RepTopMax && dup3 <= TextOps.RepDup3Max
      assert(keep == expectKeep, s"doc $id")
    }
  }

  test("text_repetition flags a planted repetitive doc and keeps a diverse one") {
    val docs = Seq(
      (1L, ("spam ham " * 40).trim),                 // 2 distinct words over 80 tokens
      (2L, (1 to 80).map(i => s"w$i").mkString(" ")), // all distinct
      (3L, ""),                                       // zero tokens (guard path)
      (4L, "   "))                                    // whitespace-only (guard path)
      .toDF("doc_id", "text")
    val out = TextOps.textRepetitionOn(docs)
      .select($"doc_id", $"n_tokens", $"ttr_ppm", $"dup3_ppm", $"top_ppm", $"keep")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._3 < TextOps.RepTtrMin && !out(1L)._6)
    assert(out(1L)._4 > TextOps.RepDup3Max)   // "spam ham" 3-grams all duplicated
    assert(out(2L)._3 == 1000000L && out(2L)._6)
    // zero-token docs: every ppm is 0, keep=false, no divide-by-zero
    Seq(3L, 4L).foreach { id =>
      assert(out(id) == ((id, 0L, 0L, 0L, 0L, false)), s"doc $id")
    }
  }

  test("index_merge probe equals the unsharded probe with the same centroids") {
    val centroids = IvfIndex.trainCentroids(IvfIndex.trainSample(emb), 8, 5)
    val queries = emb.filter($"vec_id" < 5)

    // unsharded: assign whole corpus in memory, probe directly
    val assigned = IvfIndex.assign(emb, centroids)
    val qRows = queries.select($"vec_id".cast("long"),
      $"embedding".cast("array<double>")).collect()
    val probes = qRows.flatMap { r =>
      IvfIndex.nearestN(centroids, r.getSeq[Double](1).toArray, 3).map(c => (r.getLong(0), c))
    }
    val probeDf = probes.toSeq.toDF("qid", "centroid")
    def probe(corpus: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy($"score".desc, $"vec_id".asc)
      corpus.join(probeDf, "centroid")
        .join(queries.select($"vec_id".as("qid"), $"embedding".cast("array<double>").as("qv")), "qid")
        .withColumn("score", graft.functions.VectorOps.cosineSim($"embedding", $"qv"))
        .withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
        .select($"qid", $"vec_id", $"rank")
        .as[(Long, Long, Int)].collect().toSet
    }
    val direct = probe(assigned)

    val merged = Mat.withScratchDirs("spec_shard_a", "spec_shard_b", "spec_merged") {
      case Seq(a, b, m) =>
        IvfIndex.assign(emb.filter($"vec_id" % 2 === 0), centroids)
          .write.partitionBy("centroid").mode("overwrite").parquet(a)
        IvfIndex.assign(emb.filter($"vec_id" % 2 === 1), centroids)
          .write.partitionBy("centroid").mode("overwrite").parquet(b)
        spark.read.parquet(a).unionByName(spark.read.parquet(b)).repartition($"centroid")
          .write.partitionBy("centroid").mode("overwrite").parquet(m)
        probe(spark.read.parquet(m))
    }
    assert(merged == direct)
  }

  test("merged layout has one file per bucket and no row loss") {
    val centroids = IvfIndex.trainCentroids(IvfIndex.trainSample(emb), 8, 5)
    Mat.withScratchDirs("spec_merge_files_a", "spec_merge_files_b", "spec_merge_files_m") {
      case Seq(a, b, m) =>
        IvfIndex.assign(emb.filter($"vec_id" % 2 === 0), centroids)
          .write.partitionBy("centroid").mode("overwrite").parquet(a)
        IvfIndex.assign(emb.filter($"vec_id" % 2 === 1), centroids)
          .write.partitionBy("centroid").mode("overwrite").parquet(b)
        spark.read.parquet(a).unionByName(spark.read.parquet(b)).repartition($"centroid")
          .write.partitionBy("centroid").mode("overwrite").parquet(m)
        val nRows = spark.read.parquet(m).count()
        assert(nRows == emb.count())
        val buckets = new java.io.File(m).listFiles().filter(_.getName.startsWith("centroid="))
        assert(buckets.nonEmpty)
        buckets.foreach { d =>
          val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
          assert(files.length == 1, s"${d.getName}: ${files.length} files")
        }
    }
  }
}
