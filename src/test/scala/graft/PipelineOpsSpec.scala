package graft

import org.apache.spark.sql.functions._

import graft.operators.{PipelineOps, VectorSearch}

/** Round 8 additions: global_shuffle, quality_classifier, pii_redact,
  * range_search. */
class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------- global_shuffle

  test("global_shuffle is a permutation: every doc exactly once, dense ranks") {
    val out = PipelineOps.globalShuffle(spark, sfDir)
      .select(col("doc_id"), col("shard"), col("pos")).as[(Long, Int, Int)].collect()
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id").as[Long].collect()
    assert(out.map(_._1).sorted.sameElements(docs.sorted))
    val ranks = out.map { case (_, s, p) => s.toLong * PipelineOps.ShardSize + p }.sorted
    assert(ranks.sameElements(out.indices.map(_.toLong)))
  }

  test("global_shuffle rank order == hash order; shards sized ShardSize except the last") {
    val out = PipelineOps.globalShuffle(spark, sfDir)
      .select(col("h"), col("shard"), col("pos")).as[(String, Int, Int)].collect()
    val byRank = out.sortBy { case (_, s, p) => (s, p) }.map(_._1)
    assert(byRank.sameElements(out.map(_._1).sorted))
    val sizes = out.groupBy(_._2).map { case (s, rs) => s -> rs.length }
    val last = sizes.keys.max
    sizes.foreach { case (s, n) =>
      if (s < last) assert(n == PipelineOps.ShardSize)
      else assert(n <= PipelineOps.ShardSize)
    }
  }

  test("global_shuffle is rerun- and partitioning-deterministic") {
    val a = PipelineOps.globalShuffle(spark, sfDir).collect().toSeq
    val b = PipelineOps.globalShuffle(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  // ------------------------------------------------ quality_classifier

  test("quality_classifier: keep == (logit >= 0), score is a monotone squash, and the fold matches a driver replay") {
    val rows = PipelineOps.qualityClassifier(spark, sfDir)
      .as[(Long, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, logit, score, keep) =>
      assert(keep == (logit >= 0.0))
      assert(score == logit / (1.0 + math.abs(logit)))
    }
    // replay the fold from the graded feature query itself
    val feats = operators.TextOps.textQuality(spark, sfDir)
      .select(col("doc_id"), col("n_tokens"), col("stop_ratio"),
        col("digit_ratio"), col("mean_word_len"))
      .as[(Long, Int, Double, Double, Double)].collect()
      .map { case (id, nt, sr, dr, mwl) =>
        val f1 = math.min(1.0, nt.toDouble / 50.0)
        val f4 = math.min(1.0, mwl / 8.0)
        id -> ((((PipelineOps.QcBias + PipelineOps.QcWLen * f1) +
          PipelineOps.QcWStop * sr) + PipelineOps.QcWDigit * dr) +
          PipelineOps.QcWMwl * f4)
      }.toMap
    rows.foreach { case (id, logit, _, _) => assert(logit == feats(id)) }
    // both classes occur at this SF, else the filter grades nothing
    assert(rows.exists(_._4) && rows.exists(!_._4))
  }

  // ------------------------------------------------------- pii_redact

  test("pii_redact: planted addresses/numbers are counted and gone; clean docs untouched") {
    val out = PipelineOps.piiRedact(spark, sfDir)
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    val text = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.nonEmpty)
    out.values.foreach { case (id, ne, np, red) =>
      if (id % 7 == 0) {
        assert(ne >= 1 && red.contains("<EMAIL>"))
        assert(!red.contains(s"user$id@example.com"))
      } else if (id % 11 == 3) {
        assert(np >= 1 && red.contains("<PHONE>"))
        assert(!red.matches("(?s).*\\+1 555 \\d{4}.*"))
      } else {
        assert(ne == 0 && np == 0 && red == text(id))
      }
    }
    assert(out.values.exists(_._2 > 0) && out.values.exists(_._3 > 0))
  }

  // --------------------------------------------------- text_normalize

  test("text_normalize: planted decomposed sequences compose; ASCII docs untouched; fingerprints converge") {
    val out = PipelineOps.textNormalize(spark, sfDir)
      .as[(Long, Boolean, String, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, changed, _, norm) =>
      if (id % 5 == 0) {
        assert(changed && norm.endsWith(" caf\u00e9 blend"))
        assert(!norm.contains("\u0301"))
      } else if (id % 5 == 1) {
        assert(changed && norm.endsWith(" z\u00fcrich mix"))
      } else assert(!changed)
    }
    // the dedup story: decomposed and precomposed spellings of the
    // same text must share an fp after normalization
    val a = Seq(("x café", 1L), ("x café", 2L)).toDF("t", "id")
      .select(md5(graft.functions.TextHashOps.nfcNormalize(col("t"))).as("fp"))
      .as[String].collect()
    assert(a.distinct.length == 1)
  }

  // ----------------------------------------------------- range_search

  test("range_search: exactly the >= tau set, includes self-matches, agrees with knn where they overlap") {
    val out = VectorSearch.rangeSearch(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, _, s) => assert(s >= VectorSearch.RangeTau) }
    val qids = out.map(_._1).toSet
    (0L until VectorSearch.NQueries).foreach { q =>
      assert(out.exists { case (qq, vv, ss) => qq == q && vv == q && ss > 0.999999 },
        s"self-match missing for query $q")
      assert(qids.contains(q))
    }
    // every knn_cosine hit scoring >= tau must appear in the range set
    val knn = VectorSearch.knn(operators.Knn.Cosine)(spark, sfDir)
      .select(col("qid"), col("vec_id"), col("score"))
      .as[(Long, Long, Double)].collect()
      .filter(_._3 >= VectorSearch.RangeTau)
    val rangeSet = out.map(t => (t._1, t._2)).toSet
    knn.foreach { case (q, v, _) => assert(rangeSet.contains((q, v))) }
  }
}
