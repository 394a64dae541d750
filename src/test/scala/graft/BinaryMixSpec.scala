package graft

import org.apache.spark.sql.functions._

import graft.operators.{BinaryQuant, DataMix, IvfIndex, Knn, VectorSearch}

/** Round 8 additions: knn_binary (sign-bit Hamming candidates + exact
  * rerank), data_domain_mix (integer target-mixture sampler), and
  * text_bigram_lm (exact-ppm bigram LM filter) — planted-structure
  * checks that drive the real operator bodies. */
class BinaryMixSpec extends SparkTestBase {
  import spark.implicits._

  // ---------- knn_binary ----------

  test("signCode/hamming: packing and popcount basics") {
    val v = Array(1.0, -2.0, 0.0, -0.0, 3.0)
    val c = BinaryQuant.signCode(v)
    // bits: 1,0,1,1,1 (0.0 and -0.0 both >= 0)
    assert(c.length == 1 && c(0) == 0x1DL)
    assert(BinaryQuant.hamming(c, c) == 0)
    val neg = BinaryQuant.signCode(v.map(-_))
    // sign flips except the two zero dims (still >= 0)
    assert(BinaryQuant.hamming(c, neg) == 3)
    val d70 = Array.tabulate(70)(i => if (i % 2 == 0) 1.0 else -1.0)
    val c70 = BinaryQuant.signCode(d70)
    assert(c70.length == 2)
    assert(BinaryQuant.hamming(c70, BinaryQuant.signCode(d70.map(-_))) == 70)
  }

  test("binaryTopK with R >= n degrades to exact cosine top-k") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" < 5)
    val n = emb.count().toInt
    val bin = BinaryQuant.binaryTopK(emb, q, 10, n)
      .select("qid", "vec_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val exact = Knn.topK(emb, q, 10)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(bin.nonEmpty && bin == exact)
  }

  test("binaryTopK candidate semantics: rerank of global Hamming top-R") {
    val emb = Tables.load(spark, sfDir, "embeddings").limit(200).cache()
    val q = emb.filter($"vec_id" < 3)
    val r = 17; val k = 5
    val got = try BinaryQuant.binaryTopK(emb, q, k, r)
      .as[(Long, Long, Int, Double, Int)].collect().toSeq
    finally emb.unpersist(blocking = true)

    // independent in-memory replay
    val corpus = emb.select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().map { case (id, v) => (id, v.toArray) }
    val queries = q.select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().map { case (id, v) => (id, v.toArray) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { na += a(i)*a(i); i += 1 }
      i = 0
      while (i < b.length) { dot += a(i)*b(i); nb += b(i)*b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = queries.sortBy(_._1).toSeq.flatMap { case (qid, qv) =>
      val qc = BinaryQuant.signCode(qv)
      val cand = corpus
        .map { case (id, v) => (id, BinaryQuant.hamming(BinaryQuant.signCode(v), qc), v) }
        .sortBy { case (id, h, _) => (h, id) }.take(r)
      cand.map { case (id, h, v) => (qid, id, h, cos(v, qv)) }
        .sortBy { case (_, id, _, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((a, b, c, d), i) => (a, b, c, d, i + 1) }
    }
    assert(got == want)
  }

  test("asymLut/asymScore == byte-blocked naive ±sum, bit-exact") {
    val rng = new scala.util.Random(7)
    for (dim <- Seq(5, 8, 64, 70)) {
      val qv = Array.fill(dim)(rng.nextDouble() * 2 - 1)
      val v = Array.fill(dim)(rng.nextDouble() * 2 - 1)
      val lut = BinaryQuant.asymLut(qv)
      val got = BinaryQuant.asymScore(BinaryQuant.signCode(v), lut)
      // same association: per-8 groups j-ascending, folded b-ascending
      var want = 0.0
      var b = 0
      while (8 * b < dim) {
        var g = 0.0; var j = 8 * b
        while (j < math.min(8 * b + 8, dim)) {
          g += (if (v(j) >= 0) qv(j) else -qv(j)); j += 1
        }
        want += g; b += 1
      }
      assert(got == want, s"dim=$dim")
    }
  }

  test("asymTopK candidate semantics: rerank of global asym top-R") {
    val emb = Tables.load(spark, sfDir, "embeddings").limit(200).cache()
    val q = emb.filter($"vec_id" < 3)
    val r = 17; val k = 5
    val got = try BinaryQuant.asymTopK(emb, q, k, r)
      .as[(Long, Long, Double, Double, Int)].collect().toSeq
    finally emb.unpersist(blocking = true)
    val corpus = emb.select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().map { case (id, v) => (id, v.toArray) }
    val queries = q.select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().map { case (id, v) => (id, v.toArray) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { na += a(i)*a(i); i += 1 }
      i = 0
      while (i < b.length) { dot += a(i)*b(i); nb += b(i)*b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = queries.sortBy(_._1).toSeq.flatMap { case (qid, qv) =>
      val lut = BinaryQuant.asymLut(qv)
      val cand = corpus
        .map { case (id, v) => (id, BinaryQuant.asymScore(BinaryQuant.signCode(v), lut), v) }
        .sortBy { case (id, s, _) => (-s, id) }.take(r)
      cand.map { case (id, s, v) => (qid, id, s, cos(v, qv)) }
        .sortBy { case (_, id, _, sc) => (-sc, id) }.take(k).zipWithIndex
        .map { case ((a, b, c, d), i) => (a, b, c, d, i + 1) }
    }
    assert(got == want)
  }

  test("asymTopKCoded (at-rest two-stage) == asymTopK (one-pass), bit-exact") {
    // cache must be scoped: a leaked cache of the raw table would make
    // LATER suites' plan assertions hit InMemoryTableScan (no parquet
    // PushedFilters) via the shared session's CacheManager
    val emb = Tables.load(spark, sfDir, "embeddings").cache()
    try {
      val q = emb.filter($"vec_id" < 5)
      val coded = BinaryQuant.codes(emb)
      val a = BinaryQuant.asymTopKCoded(coded, emb, q, 7, 23)
        .as[(Long, Long, Double, Double, Int)].collect().toSeq
      val b = BinaryQuant.asymTopK(emb, q, 7, 23)
        .as[(Long, Long, Double, Double, Int)].collect().toSeq
      assert(a.nonEmpty && a == b)
    } finally emb.unpersist(blocking = true)
  }

  test("knn_binary: every query finds itself at rank 1 with score 1") {
    val df = BinaryQuant.knnBinary(spark, sfDir).filter($"rank" === 1)
      .select("qid", "vec_id", "hamming", "score")
      .as[(Long, Long, Int, Double)].collect()
    assert(df.length == VectorSearch.NQueries)
    df.foreach { case (qid, id, h, s) =>
      assert(qid == id && h == 0 && math.abs(s - 1.0) < 1e-12)
    }
  }

  test("AsymSignDotD codegen == eval == asymLut path, bit-exact") {
    val rng = new scala.util.Random(11)
    for (dim <- Seq(8, 64, 70)) {
      val qv = Array.fill(dim)(rng.nextDouble() * 2 - 1)
      val cv = Array.fill(dim)(rng.nextDouble() * 2 - 1)
      val df = Seq((cv.toSeq, qv.toSeq)).toDF("a", "b")
        .select(graft.functions.VectorOps.asymSignDot($"a", $"b").as("s"))
      val viaExpr = df.as[Double].head() // codegen path
      val viaLut = BinaryQuant.asymScore(BinaryQuant.signCode(cv), BinaryQuant.asymLut(qv))
      assert(viaExpr == viaLut, s"dim=$dim codegen vs LUT")
    }
  }

  test("ivf_binary: every query finds itself at rank 1; asym bounded by |Σq|") {
    val df = BinaryQuant.ivfBinary(spark, sfDir).cache()
    try {
      val top = df.filter($"rank" === 1)
        .select("qid", "vec_id", "score").as[(Long, Long, Double)].collect()
      assert(top.length == VectorSearch.NQueries)
      top.foreach { case (qid, id, s) =>
        assert(qid == id && math.abs(s - 1.0) < 1e-12)
      }
      // |asym(v, q)| <= Σ|q_i| for any v — sanity on the kernel
      val emb = Tables.load(spark, sfDir, "embeddings")
      val qAbs = emb.filter($"vec_id" < VectorSearch.NQueries)
        .select($"vec_id", expr("aggregate(embedding, 0D, (acc, x) -> acc + abs(x))").as("cap"))
        .as[(Long, Double)].collect().toMap
      df.select("qid", "asym").as[(Long, Double)].collect().foreach { case (q, a) =>
        assert(math.abs(a) <= qAbs(q) + 1e-9)
      }
    } finally df.unpersist(blocking = true)
  }

  // ---------- ivf_binary_coded ----------

  test("SignCodeL packing == signCode; AsymCodeDotD == AsymSignDotD == LUT, bit-exact incl. ragged dims") {
    val rng = new scala.util.Random(17)
    for (dim <- Seq(8, 64, 70, 130)) {
      val qv = Array.fill(dim)(rng.nextDouble() * 2 - 1)
      val cv = Array.fill(dim)(rng.nextDouble() * 2 - 1)
      val df = Seq((cv.toSeq, qv.toSeq)).toDF("a", "b")
      val viaCode = df.select(graft.functions.VectorOps.asymCodeDot(
        graft.functions.VectorOps.signCode($"a"), $"b").as("s")).as[Double].head()
      val viaFloat = df.select(
        graft.functions.VectorOps.asymSignDot($"a", $"b").as("s")).as[Double].head()
      val viaLut = BinaryQuant.asymScore(
        BinaryQuant.signCode(cv), BinaryQuant.asymLut(qv))
      assert(viaCode == viaFloat && viaCode == viaLut, s"dim=$dim")
      val packed = df.select(
        graft.functions.VectorOps.signCode($"a").as("c")).as[Seq[Long]].head()
      assert(packed == BinaryQuant.signCode(cv).toSeq, s"dim=$dim packing")
    }
  }

  test("ivf_binary_coded: at-rest coded probe == in-memory ivf_binary; candidate scan prunes partitions, never reads the float column") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" < 10)
    val centroids = IvfIndex.trainCentroids(IvfIndex.trainSample(emb), 8, 10)
    graft.Mat.withScratchDirs("coded_spec") { case Seq(dir) =>
      BinaryQuant.writeCodedLayout(emb, centroids, dir)
      val loaded = spark.read.parquet(dir)
      val a = BinaryQuant.ivfBinaryCodedProbe(loaded, q, centroids, 7, 23, 3)
        .as[(Long, Long, Double, Double, Int)].collect().toSeq
      val b = BinaryQuant.ivfBinaryOn(emb, q, centroids, 7, 23, 3)
        .as[(Long, Long, Double, Double, Int)].collect().toSeq
      assert(a.nonEmpty && a == b)

      // stage-1 plan: explicit partition predicate; the only file scan
      // reads (vec_id, code) — the embedding column never decodes
      val probeDf = Seq((0L, 0), (1L, 1)).toDF("qid", "centroid")
      val qv = q.select($"vec_id".as("qid"),
        $"embedding".cast("array<double>").as("qv"))
      val plan = BinaryQuant.codedCandidates(loaded, probeDf, Seq(0, 1), qv)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("centroid"),
        plan.take(800))
      // two file scans exist: the broadcast query side (reads floats
      // from embeddings.parquet — fine) and the LAYOUT scan; only the
      // latter (rooted in the scratch dir) must be code-only
      val layoutScans = plan.linesIterator
        .filter(l => l.contains("ReadSchema") && l.contains("graft_coded_spec"))
        .toList
      assert(layoutScans.nonEmpty, plan.take(1200))
      layoutScans.foreach { l =>
        assert(l.contains("code") && !l.contains("embedding"), l)
      }
    }
  }

  test("stream_ivf_coded == batch ivf_binary, row for row (same deterministic training)") {
    val a = graft.streaming.StreamingQueries.streamIvfCoded(spark, sfDir)
      .as[(Long, Long, Double, Double, Int)].collect().toSeq
    val b = BinaryQuant.ivfBinary(spark, sfDir)
      .as[(Long, Long, Double, Double, Int)].collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  // ---------- stream_nsw ----------

  test("stream_nsw == batch hnsw_search, row for row") {
    val a = graft.streaming.StreamingQueries.streamNsw(spark, sfDir)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val b = graft.operators.HnswAnn.hnswGraded(spark, sfDir)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  // ---------- data_domain_mix ----------

  test("domainMixOn matches a direct per-doc replay of the keep rule") {
    val docs = (0L until 300L).map { i =>
      val src = s"src${(i % 7)}"
      (i, s"doc $i", "en", src, 50L + (i % 91))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = DataMix.domainMixOn(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq

    val rows = docs.as[(Long, String, String, String, Long)].collect()
    val bySrc = rows.groupBy(_._4)
    val wt = bySrc.keys.map(s => s -> ((s.drop(3).toLong * 3) % 5 + 1)).toMap
    val chars = bySrc.map { case (s, rs) => s -> rs.map(_._5).sum }
    val wtot = wt.values.sum
    val ctot = chars.values.sum
    def hash32(id: Long): Long =
      graft.functions.TextHash.md5Lower64(s"mix:$id".getBytes("UTF-8")) & 4294967295L
    val want = bySrc.toSeq.sortBy(_._1).map { case (s, rs) =>
      val kept = rs.filter(r => hash32(r._1) * (wtot * chars(s)) < wt(s) * ctot * 4294967296L)
      (s, wt(s), rs.length.toLong, kept.length.toLong, kept.map(_._5).sum)
    }
    assert(got == want)
    // the planted weights span both regimes
    assert(want.exists { case (_, _, nIn, nKept, _) => nKept == nIn },
      "no capped (rate>=1) source in the plant")
    assert(want.exists { case (_, _, nIn, nKept, _) => nKept < nIn },
      "no down-sampled source in the plant")
  }

  test("data_domain_mix is rerun-deterministic and conserves totals") {
    val a = DataMix.dataDomainMix(spark, sfDir).collect().toSeq
    val b = DataMix.dataDomainMix(spark, sfDir).collect().toSeq
    assert(a == b && a.nonEmpty)
    val docs = Tables.load(spark, sfDir, "documents")
    val nIn = docs.count()
    assert(a.map(_.getLong(2)).sum == nIn)
    a.foreach(r => assert(r.getLong(3) <= r.getLong(2)))
  }

  // ---------- text_bigram_lm ----------

  test("bigramLmOn: hand-computed ppm on a planted corpus") {
    // corpus counts: c(x,y)=4, c(y,x)=3, c(x,a)=c(a,x)=c(x,b)=1
    // → c1(x)=6, c1(y)=3, c1(a)=1.
    // doc 0: 4×(x,y)@(4e6//6=666_666) + 3×(y,x)@(3e6//3=1_000_000)
    //   → 5_666_664 // 7 = 809_523
    // doc 1: (x,a)@166_666 + (a,x)@1_000_000 + (x,b)@166_666
    //   → 1_333_332 // 3 = 444_444
    val docs = Seq(
      (0L, "x y x y x y x y", "en", "s0", 15L),
      (1L, "x a x b", "en", "s0", 7L),
      (2L, "solo", "en", "s0", 4L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = DataMix.bigramLmOn(docs)
      .select("doc_id", "n_bigrams", "lm_ppm", "keep")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (0L, 7L, 809523L, true),
      (1L, 3L, 444444L, true),
      (2L, 0L, 0L, false)))
  }

  test("text_bigram_lm splits the graded corpus at the threshold") {
    val df = DataMix.textBigramLm(spark, sfDir)
    val kept = df.filter($"keep").count()
    val total = df.count()
    assert(total > 0 && kept > 0 && kept < total,
      s"threshold does not split: $kept/$total")
  }
}
