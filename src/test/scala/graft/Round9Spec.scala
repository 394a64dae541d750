package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IvfIndex}

/** Round-9 specs: semdedup hot-cluster salting. */
class Round9Spec extends SparkTestBase {
  import spark.implicits._

  test("semdedup: salted verify join == unsalted, bit-equal") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(
      IvfIndex.trainSample(emb), Dedup.SemDedupNlist, 10)
    val corpus = emb.select(col("vec_id"), col("embedding"))
    def run(salt: Int) =
      Dedup.semDedupOn(corpus, centroids, Dedup.SemDedupTau, salt)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    val unsalted = run(1)
    val salted = run(Dedup.SemDedupSalt)
    assert(salted == unsalted,
      s"salting changed results: ${salted.diff(unsalted).take(5)}")
    assert(unsalted.nonEmpty)
  }

  test("semdedup: a planted hot cluster's verify work splits across salt keys (per-task bound)") {
    // Every row lands in ONE k-means cell: without salting the entire
    // quadratic verify is a single reducer task. With salting, side A
    // of the join keys on (centroid, vid % salt) — assert no salt
    // bucket exceeds ceil(n/salt) rows (vec_ids are dense here; at
    // scale the modulo spreads any id distribution without a hot
    // residue class because ids are unique).
    val n = 200
    val salt = Dedup.SemDedupSalt
    val vecs = (0 until n).map { i =>
      (i.toLong, Seq.tabulate(8)(d => if (d == 0) 1.0 else 0.001 * i))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0, 0, 0, 0, 0, 0, 0))
    val assigned = IvfIndex.assign(corpus, cents)
    val sideACounts = assigned
      .withColumn("salt", (col("vec_id") % salt).cast("int"))
      .groupBy("centroid", "salt").count()
      .collect().map(_.getLong(2))
    assert(sideACounts.length == salt, s"expected $salt salt buckets")
    assert(sideACounts.max <= math.ceil(n.toDouble / salt).toLong,
      s"hot cluster not split: max bucket ${sideACounts.max}")
    // and the salted dedup over the hot cluster is still correct:
    // identical leading dimension makes nothing a dup at tau close to 1
    // except planted exact copies
    val planted = corpus.unionByName(
      corpus.filter(col("vec_id") < 3)
        .select((col("vec_id") + 1000L).as("vec_id"), col("embedding")))
    val out = Dedup.semDedupOn(planted, cents, 0.999999, salt)
      .filter(!col("keep"))
      .select("vec_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(out == Set((1000L, 0L), (1001L, 1L), (1002L, 2L)), out.toString)
  }

  test("bpe: dictTokenCounts (driver replay) == encodeDistinctWords (batched chain), small batch") {
    import graft.operators.Bpe
    val dict = Array(("banana", 50L), ("bandana", 30L), ("cabana", 20L),
      ("anna", 10L), ("x", 5L))
    val merges = Bpe.trainMerges(dict, 6).map(t => (t._2, t._3))
    assert(merges.nonEmpty)
    val viaDriver = Bpe.dictTokenCounts(dict, merges).toMap
    // batch=2 forces several chained projections + the truncation path
    val viaChain = Bpe.encodeDistinctWords(
      dict.map(_._1).toSeq.toDF("word"), merges, batch = 2)
      .as[(String, Long)].collect().toMap
    assert(viaChain == viaDriver, s"chain=$viaChain driver=$viaDriver")
  }

  test("bpe_encode: dictionary-join path == pure merge-chain path on real docs") {
    import graft.operators.Bpe
    val docs = Tables.load(spark, sfDir, "documents")
    val dict = Bpe.wordFreq(docs)
    val merges = Bpe.trainMerges(dict, Bpe.Merges).map(t => (t._2, t._3))
    // chain-only twin: every word through the inline replace chain
    val segSql = merges.foldLeft(
      "concat('|', array_join(split(word, '(?=.)'), '||'), '|')") {
      case (acc, (l, r)) => s"replace($acc, '|$l||$r|', '|$l$r|')"
    }
    val words = docs.select(col("doc_id"),
      explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
    val chainAgg = words.withColumn("s", expr(segSql))
      .select(col("doc_id"),
        ((length(col("s")) - length(translate(col("s"), "|", "")))
          .cast("long") / 2).cast("long").as("toks"))
      .groupBy("doc_id").agg(sum("toks").as("n_tokens"))
      .as[(Long, Long)].collect().toMap
    val viaDict = Bpe.bpeEncode(spark, sfDir)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(viaDict.filter(_._2 > 0) == chainAgg, "dictionary-join encode diverged from chain encode")
  }

  test("ivfpq_coded: at-rest coded probe == in-memory ivfpq_search; candidate scan prunes partitions, never reads the float column") {
    import graft.operators.{IvfPq, VectorSearch}
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" < VectorSearch.NQueries)
    val model = IvfPq.trainModel(IvfIndex.trainSample(emb))
    graft.Mat.withScratchDirs("pq_coded_spec") { case Seq(dir) =>
      IvfPq.writeCodedPqLayout(emb, model, dir)
      val loaded = spark.read.parquet(dir)
      val a = IvfPq.ivfpqCodedProbe(loaded, q, model, VectorSearch.K)
        .as[(Long, Long, Double, Int)].collect().toSeq
      val b = IvfPq.search(emb, q, VectorSearch.K, model)
        .as[(Long, Long, Double, Int)].collect().toSeq
      assert(a.nonEmpty && a == b,
        s"coded != in-memory; first diff: ${a.zip(b).find(p => p._1 != p._2)}")

      // stage-1 plan: explicit partition predicate; the LAYOUT scan
      // reads (vec_id, codes) only — the embedding column never decodes
      val probeDf = Seq((0L, 0, Seq.fill(model.cb.m)(Seq.fill(16)(0.0))))
        .toDF("qid", "centroid", "lut")
      val plan = IvfPq.pqCodedCandidates(loaded, probeDf, Seq(0, 1))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("centroid"),
        plan.take(800))
      val layoutScans = plan.linesIterator
        .filter(l => l.contains("ReadSchema") && l.contains("pq_coded_spec"))
        .toList
      assert(layoutScans.nonEmpty, plan.take(1200))
      layoutScans.foreach { l =>
        assert(l.contains("code") && !l.contains("embedding"), l)
      }
    }
  }

  test("packCodes round-trips every byte lane") {
    import graft.operators.IvfPq
    val codes = Array(0, 255, 15, 128, 1, 77, 254, 200)
    val w = IvfPq.packCodes(codes)
    (0 until 8).foreach { s =>
      assert(((w >>> (8 * s)) & 0xffL).toInt == codes(s), s"lane $s")
    }
    assert(IvfPq.packCodes(Array(3)) == 3L)
  }

  test("bm25: self-match ranks first; a planted near-copy outranks unrelated docs") {
    import graft.operators.Bm25
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon eta"),   // near-copy of 0
      (2L, "one two three four five six"),
      (3L, "seven eight nine ten eleven twelve"),
      (4L, "alpha one seven unique thirteen fourteen"))
      .toDF("doc_id", "text")
    val out = Bm25.bm25TopN(docs, 5)
      .filter($"qid" === 0L)
      .orderBy($"rank")
      .select("doc_id").as[Long].collect().toSeq
    assert(out.head == 0L, s"self-match not rank 1: $out")
    assert(out.indexOf(1L) == 1, s"near-copy not rank 2: $out")
    // docs sharing no term never appear
    assert(!out.contains(2L) && !out.contains(3L), out.toString)
  }

  test("bm25: rarer shared terms score higher than corpus-wide terms (idf ordering)") {
    import graft.operators.Bm25
    // 'common' appears in every doc (idf 0); 'rare' in exactly two.
    val docs = Seq(
      (0L, "common rare filler1 filler2"),
      (1L, "common rare fillerA fillerB"),
      (2L, "common x1 x2 x3"),
      (3L, "common y1 y2 y3"))
      .toDF("doc_id", "text")
    val scores = Bm25.bm25TopN(docs, 4).filter($"qid" === 0L)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    // doc 1 shares common+rare; docs 2,3 share only the idf-0 'common'
    assert(scores(1L) > scores(2L) && scores(1L) > scores(3L), scores.toString)
  }

  test("bm25 over the at-rest postings layout == one-shot bm25TopN, bit-equal") {
    import graft.operators.Bm25
    val docs = Tables.load(spark, sfDir, "documents")
    val oneShot = Bm25.bm25TopN(docs, Bm25.K).orderBy("qid", "rank")
      .as[(Long, Long, Long, Int)].collect().toSeq
    graft.Mat.withScratchDirs("bm25_spec") { case Seq(dir) =>
      Bm25.writePostingsLayout(docs, dir)
      val qterms = spark.read.parquet(s"$dir/tf")
        .filter($"doc_id" < Bm25.NQueriesB)
        .select($"doc_id".as("qid"), $"word")
      val served = Bm25.bm25OverPostings(spark, dir, qterms, Bm25.K)
        .orderBy("qid", "rank").as[(Long, Long, Long, Int)].collect().toSeq
      assert(served.nonEmpty && served == oneShot,
        s"postings serve diverged; first diff: ${served.zip(oneShot).find(p => p._1 != p._2)}")
    }
  }

  test("hybrid_rrf: a doc found by both systems outranks equal-rank single-system docs") {
    import graft.operators.Bm25
    // build the fused frame by hand through the same rrf arithmetic
    val vec = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3)).toDF("qid", "id", "vec_rank")
    val bm = Seq((0L, 10L, 3), (0L, 13L, 1), (0L, 14L, 2)).toDF("qid", "id", "bm25_rank")
    val fused = vec.join(bm, Seq("qid", "id"), "full_outer")
      .withColumn("rrf", expr(
        s"coalesce(1.0D / (${Bm25.RrfK} + vec_rank), 0.0D) + coalesce(1.0D / (${Bm25.RrfK} + bm25_rank), 0.0D)"))
      .orderBy(desc("rrf"), $"id")
      .select("id").as[Long].collect().toSeq
    // id 10: vec rank 1 + bm rank 3 — two lists beat any single list
    assert(fused.head == 10L, fused.toString)
    // singles order among themselves by their one rank
    assert(fused.indexOf(13L) < fused.indexOf(14L), fused.toString)
  }

  test("stream_hybrid == batch hybrid_rrf, row for row") {
    import graft.operators.Bm25
    def key(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        r.getDouble(4), r.getInt(5))).toSeq
    val batch = key(Bm25.hybridRrf(spark, sfDir))
    val streamed = key(graft.streaming.StreamingQueries.streamHybrid(spark, sfDir))
    assert(streamed.nonEmpty && streamed == batch,
      s"first diff: ${streamed.zip(batch).find(p => p._1 != p._2)}")
  }

  test("merged shard postings serve BM25 identically to the whole-corpus postings layout") {
    import graft.operators.Bm25
    val docs = Tables.load(spark, sfDir, "documents")
    graft.Mat.withScratchDirs("bm25_whole", "bm25_sh0", "bm25_sh1", "bm25_merged") {
      case Seq(whole, sh0, sh1, merged) =>
        Bm25.writePostingsLayout(docs, whole)
        Bm25.writePostingsLayout(docs.filter($"doc_id" % 2 === 0), sh0)
        Bm25.writePostingsLayout(docs.filter($"doc_id" % 2 === 1), sh1)
        Bm25.mergePostingsLayouts(spark, Seq(sh0, sh1), merged)
        val qterms = spark.read.parquet(s"$whole/tf")
          .filter($"doc_id" < Bm25.NQueriesB)
          .select($"doc_id".as("qid"), $"word")
        def serve(dir: String) =
          Bm25.bm25OverPostings(spark, dir, qterms, Bm25.K)
            .orderBy("qid", "rank").as[(Long, Long, Long, Int)].collect().toSeq
        val a = serve(whole); val b = serve(merged)
        assert(a.nonEmpty && a == b, "merged shards diverge from the whole-corpus index")
    }
  }

  test("retrieval_comparison: hybrid provenance counts partition the 10 fused hits per query") {
    import graft.operators.Bm25
    val rows = Bm25.retrievalComparison(spark, sfDir)
      .select("qid", "dense_bm25_overlap", "hybrid_both",
        "hybrid_dense_only", "hybrid_bm25_only")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == (0L until 10L))
    rows.foreach { case (q, ov, both, d, b) =>
      assert(both + d + b == Bm25.K, s"qid=$q: provenance doesn't partition the top-10")
      // the self-match is rank 1 in both systems, so 'both' >= 1
      assert(both >= 1, s"qid=$q: self-match missing from both lists")
      assert(ov >= 0 && ov <= Bm25.K)
    }
  }

  test("hybrid_rrf on testdata: every query's fused head is the self-match; ranks consistent with inputs") {
    import graft.operators.Bm25
    val out = Bm25.hybridRrf(spark, sfDir)
    val heads = out.filter($"rank" === 1)
      .select("qid", "id").as[(Long, Long)].collect().toSeq
    // self-match is rank 1 in BOTH systems → rrf 2/(60+1), unbeatable
    assert(heads.nonEmpty && heads.forall(p => p._1 == p._2), heads.toString)
    val bad = out.filter($"vec_rank".isNull && $"bm25_rank".isNull).count()
    assert(bad == 0, "a fused row lost both source ranks")
  }
}
