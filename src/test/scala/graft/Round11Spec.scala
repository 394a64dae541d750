package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Sketches, VectorSearch}

/** Round 11: the sketch family gains Count-Min heavy hitters (graded
  * accuracy table, cellwise-mergeable grid), decontamination gains the
  * Bloom-prefiltered 100 TB form (no false negatives by construction —
  * pinned, not assumed), and curation gains greedy k-center coreset
  * selection (bit-equal to a brute-force greedy reference). */
class Round11Spec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------------- count-min

  test("CMS grid merges across shards by cellwise addition (linearity)") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    def grid(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
      Sketches.cmsGrid(Sketches.wordCounts(df))
        .as[(Int, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val whole = grid(docs)
    val merged = (grid(a).toSeq ++ grid(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(merged == whole, "sharded grids did not fold to the whole-corpus grid")
  }

  test("CMS estimate is a one-sided OVER-estimate on every graded row") {
    val rows = Sketches.sketchHeavyHitters(spark, sfDir)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, exact, est) =>
      assert(est >= exact, s"CMS under-estimated '$w': $est < $exact")
    }
  }

  test("stream_cms == batch CMS grid (bounded 1024-cell state, any chunking)") {
    val streamed = streaming.StreamingQueries.streamCms(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    val batch = Sketches.cmsGrid(
        Sketches.wordCounts(Tables.load(spark, sfDir, "documents")))
      .select(col("j").cast("long"), col("bucket"), col("counter"))
      .orderBy("j", "bucket")
      .as[(Long, Long, Long)].collect().toSeq
    assert(streamed == batch, "streamed grid diverged from batch grid")
  }

  // ------------------------------------------------- bloom decontam

  test("bloom prefilter has NO false negatives: flagged set ⊇ exact decontaminate set, and n_pass ≥ n_shared") {
    val bloom = Dedup.dataDecontaminateBloom(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    bloom.foreach { case (id, nGrams, nPass, nShared) =>
      assert(nPass >= nShared, s"doc $id: bloom passed fewer grams than are truly shared")
      assert(nGrams >= nPass, s"doc $id: more passes than grams")
    }
    val flagged = bloom.map(_._1).toSet
    val exact = Dedup.dataDecontaminate(spark, sfDir)
      .select("train_id").distinct().as[Long].collect().toSet
    assert(exact.subsetOf(flagged),
      s"bloom prefilter DROPPED truly contaminated docs: ${(exact -- flagged).take(5)}")
    // and the per-doc shared-gram totals agree with the exact operator
    val exactTotals = Dedup.dataDecontaminate(spark, sfDir)
      .groupBy("train_id").agg(sum("n_shared")) // per (train,eval) pair counts
      .as[(Long, Long)].collect().toMap
    // n_shared in the bloom table counts DISTINCT shared grams (vs any
    // eval doc), exactTotals counts pair-wise — so only ≤ holds
    bloom.foreach { case (id, _, _, nShared) =>
      assert(nShared <= exactTotals.getOrElse(id, 0L),
        s"doc $id: distinct shared grams exceed the pairwise total")
    }
  }

  test("bloom membership arithmetic: a planted eval gram passes, an absent gram's pass is a measurable FP event") {
    // plant a corpus where one train doc copies an eval 3-gram exactly
    // and another shares nothing
    val docs = Seq(
      (0L, "alpha beta gamma delta", "en", "s", 22L),
      (30L, "zzz alpha beta gamma", "en", "s", 20L),
      (31L, "qqq www eee rrr ttt", "en", "s", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.decontaminateBloom(docs, "doc_id", "text")
      .select("train_id").as[Long].collect().toSet
    assert(out.contains(30L), "doc sharing 'alpha beta gamma' must be flagged")
  }

  test("stream_decontaminate (bitmap kernel, zero state) == batch bloom join membership") {
    val streamed = streaming.StreamingQueries.streamDecontaminate(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    val batch = Dedup.dataDecontaminateBloom(spark, sfDir)
      .select("train_id", "n_grams", "n_pass")
      .as[(Long, Long, Long)].collect().toSeq
    assert(streamed == batch,
      "bitmap-kernel flagger diverged from the join-membership batch form")
  }

  test("bottom-k sample folds losslessly: sample(shard A ∪ B) == merge of shard samples") {
    val docs = Tables.load(spark, sfDir, "documents")
    def sample(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] = {
      val h = df.select(col("lang"), col("doc_id"),
        shiftrightunsigned(graft.functions.TextHashOps.md5Lower64(
          concat(lit("bksamp:"), col("doc_id"))), 1).as("h"))
      h.groupBy("lang")
        .agg(graft.functions.KmvOps.kmvBottomK(col("h"), operators.TextOps.SampleBkK).as("bk"))
        .join(h, "lang").filter(array_contains(col("bk"), col("h")))
        .groupBy("lang").agg(sort_array(collect_list(struct(col("h"), col("doc_id")))).as("s"))
        .select(col("lang"), col("s.doc_id").as("ids"))
        .as[(String, Seq[Long])].collect().toMap
    }
    val whole = sample(docs)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    // merge = re-sampling the UNION of the two shard samples (bottom-k
    // of a union == bottom-k of merged bottom-ks)
    val keep = (sample(a).values.flatten ++ sample(b).values.flatten).toSeq.distinct
    val merged = sample(docs.filter(col("doc_id").isInCollection(keep)))
    assert(merged == whole, "shard samples did not fold to the whole-corpus sample")
  }

  // ------------------------------------- large-star/small-star CC

  test("large-star/small-star CC == union-find on path, random, and skewed graphs") {
    def ref(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x; while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r); r
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    def check(edges: Seq[(Long, Long)], tag: String): Unit = {
      val df = edges.toDF("doc_a", "doc_b")
      val got = Dedup.ccLargeStar(df).as[(Long, Long)].collect().toMap
      assert(got == ref(edges), s"largestar diverged from union-find on $tag")
    }
    // a 60-node PATH — the diameter case label propagation crawls on
    check((0L until 59L).map(i => (i, i + 1)), "path")
    // a hot hub (degree 50) plus a chain off it
    check((1L to 50L).map(i => (0L, i)) ++ Seq((50L, 51L), (51L, 52L)), "hub")
    val rnd = new scala.util.Random(3)
    check(Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2).distinct, "random")
  }

  test("TopKScoreAgg == window row_number ranking on random data (incl. score ties)") {
    val rnd = new scala.util.Random(5)
    // coarse scores force ties, exercising the (score desc, id asc) order
    val rows = (0 until 5000).map(i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(7) / 7.0, i.toLong))
    val df = rows.toDF("qid", "score", "vid").repartition(8)
    val viaAgg = df.groupBy("qid")
      .agg(graft.functions.TopKAggOps.topKByScore(col("score"), col("vid"), 5).as("arr"))
      .select(col("qid"), posexplode(col("arr")))
      .select(col("qid"), col("col.vid").as("vid"), col("col.score").as("score"),
        (col("pos") + 1).as("rank"))
      .as[(Long, Long, Double, Long)].collect().toSet
    val viaWindow = df.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("score").desc, col("vid").asc)))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("vid"), col("score"), col("rank").cast("long"))
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(viaAgg == viaWindow, "bounded top-k aggregate diverged from window ranking")
  }

  // ------------------------------------------- pruned exact kNN graph

  test("knn_graph_pruned == brute-force knn_graph bit-for-bit (testdata)") {
    val pruned = VectorSearch.knnGraphPruned(spark, sfDir)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val brute = VectorSearch.knnGraph(spark, sfDir)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(pruned == brute, "pruning changed the exact graph")
  }

  test("pruned graph is exact AND actually prunes on a clustered corpus") {
    val rnd = new scala.util.Random(7)
    val n = 600; val dim = 16; val nClust = 12
    // well-separated cluster centers + small noise — the regime real
    // embedding spaces live in (and where IVF bounds bite)
    val centers = Array.fill(nClust, dim)(rnd.nextDouble() * 10.0)
    val data = (0 until n).map { i =>
      val c = centers(i % nClust)
      (i.toLong, c.map(x => x + rnd.nextGaussian() * 0.05).toSeq)
    }
    val df = data.toDF("vec_id", "embedding")
    val k = 5
    val cand = VectorSearch.prunedCandidates(df, k).persist()
    val got = {
      import org.apache.spark.sql.expressions.Window
      cand.withColumn("rank", org.apache.spark.sql.functions.row_number().over(
          Window.partitionBy("qid").orderBy(col("score").desc, col("vid").asc)))
        .filter(col("rank") <= k)
        .select(col("qid"), col("vid"), col("score"), col("rank"))
        .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    }
    // brute-force reference on the same frame
    val brute = operators.Knn.topK(df, df, k + 1, operators.Knn.Cosine)
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("score").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("score"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    assert(got == brute, "pruned graph diverged from brute force on the clustered corpus")
    val scanned = cand.count()
    val full = n.toLong * (n - 1)
    assert(scanned < full / 2,
      s"pruning scanned $scanned of $full pairs — no better than half the quadratic")
  }

  // ------------------------------------------------------- k-center

  test("curate_kcenter trace == brute-force greedy reference on a random corpus") {
    val rnd = new scala.util.Random(11)
    val n = 200; val dim = 8
    val data = (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextDouble())))
    val df = data.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val got = Curation.kcenterTable(df, k = 6)
      .as[(Int, Long, Double)].collect().toSeq

    // reference: plain greedy farthest-first in driver memory
    def l2sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val byId = data.toMap
    var centers = List(0L)
    var trace = List((1, 0L, 0.0))
    for (step <- 2 to 6) {
      val cands = data.filter(d => !centers.contains(d._1))
        .map { case (id, v) => (id, centers.map(c => l2sq(v, byId(c))).min) }
      val best = cands.maxBy { case (id, d) => (d, -id) }
      centers = centers :+ best._1
      trace = trace :+ ((step, best._1, best._2))
    }
    assert(got == trace.toSeq, s"greedy trace diverged:\n got=$got\n ref=$trace")
  }

  test("k-center max-min distance is non-increasing over steps (farthest-first invariant)") {
    val got = Curation.curateKcenter(spark, sfDir)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    val dists = got.drop(1).map(_._3) // step 1 is the seed (0.0)
    assert(dists.nonEmpty && dists.zip(dists.tail).forall { case (a, b) => a >= b },
      s"selection radii increased: ${dists.toSeq}")
    assert(got.map(_._2).distinct.length == got.length, "a center was picked twice")
  }
}
