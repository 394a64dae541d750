package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round 15: the LSH-tradeoff truth side moves onto the prefix-filtered
  * inverted index (lossless at τ = 1/2), pinned where it matters — a
  * planted STOP-SHINGLE-heavy corpus where the superseded full-postings
  * self-join would melt quadratically while the prefix index never even
  * sees the hot shingle. */
class Round15Spec extends SparkTestBase {
  import spark.implicits._

  /** Planted corpus: every doc shares one boilerplate run (a stop
    * shingle present in ALL docs — the df² melt case), each doc adds
    * unique filler, and docs 2i/2i+1 of the first `nDups` pairs share
    * enough text to sit above J = 1/2. */
  private def plantedDocs(n: Int, nDups: Int) = {
    val boiler = "terms of service apply"
    val rows = (0 until n).map { i =>
      val pairSeed = i / 2
      val isDup = pairSeed < nDups && i < 2 * nDups
      val unique = s"u${i}a u${i}b"
      val shared =
        s"alpha$pairSeed beta$pairSeed gamma$pairSeed delta$pairSeed " +
          s"epsilon$pairSeed zeta$pairSeed eta$pairSeed theta$pairSeed"
      val text = if (isDup) s"$boiler $shared $unique"
                 else s"$boiler $unique c${i}a c${i}b c${i}c c${i}d c${i}e c${i}f"
      (i.toLong, text)
    }
    rows.toDF("doc_id", "text")
  }

  private def shingleBase(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), expr("filter(split(text, ' '), x -> x != '')").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(1, size(w) - 2), i -> concat_ws(' ', w[i-1], w[i], w[i+1]))"))
        .as("sh"))

  /** Brute-force J ≥ 1/2 pair set, driver-side, from the same shingle
    * basis — the quadratic definition the prefix join must equal. */
  private def bruteTruth(base: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val sets = base.select(col("doc_id"), col("sh"))
      .as[(Long, Seq[String])].collect().toMap.view.mapValues(_.toSet).toMap
    val ids = sets.keys.toSeq.sorted
    (for {
      a <- ids; b <- ids if a < b
      inter = (sets(a) & sets(b)).size
      if 2L * inter >= sets(a).size + sets(b).size - inter
    } yield (a, b)).toSet
  }

  test("prefix-filtered truth == brute-force J>=1/2 on a stop-shingle-heavy corpus") {
    val n = 120; val nDups = 7
    val base = shingleBase(plantedDocs(n, nDups))
    val got = Dedup.prefixTruthPairs(base)
      .as[(Long, Long)].collect().toSet
    val want = bruteTruth(base)
    assert(want.size >= nDups, s"planting failed: only ${want.size} true pairs")
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("prefix candidates are bounded by near-dup density, not the hot shingle's df") {
    val n = 120; val nDups = 7
    val base = shingleBase(plantedDocs(n, nDups))
    val nCand = Dedup.prefixTruthCandidates(base).count()
    // the boilerplate shingles have df = n, so a full-postings self-join
    // generates >= n(n-1)/2 pair events for each; the prefix index keeps
    // only each doc's rarest half, which the df=n shingles never enter —
    // candidates collapse to the planted pairs plus hash-order noise
    val full = n.toLong * (n - 1) / 2
    assert(nCand < full / 10,
      s"prefix candidates $nCand not << full-postings pair floor $full")
    assert(nCand >= nDups.toLong, s"prefix filter lost planted pairs: $nCand")
  }

  test("link_predict: a planted super-cap hub middle generates ZERO wedge events") {
    import graft.operators.GraphRank
    // star K1,60: every candidate pair's only common neighbor is the hub
    val star = (1L to 60L).map(i => (0L, i)).toDF("src", "dst")
    val uncapped = GraphRank.linkPredictOverEdges(star, Long.MaxValue).count()
    val capped = GraphRank.linkPredictOverEdges(star, 50L).count()
    assert(uncapped > 0L, "fixture: the hub should generate wedges uncapped")
    assert(capped == 0L, s"hub middle above the cap still produced $capped pairs")
  }

  test("link_predict: capped path is bit-equal to uncapped on the regular graded graph") {
    import graft.operators.GraphRank
    val edges = GraphRank.sharedEdges(spark, sfDir)
    val graded = GraphRank.linkPredictOverEdges(edges)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val exact = GraphRank.linkPredictOverEdges(edges, Long.MaxValue)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(graded.nonEmpty && graded == exact,
      "LinkMiddleCap fired on the K-regular kNN graph — it must sit above its degrees")
  }

  test("SortedIntersectL codegen == driver merge count on random sorted arrays") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val a = Seq.fill(rnd.nextInt(20))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(20))(rnd.nextInt(40).toLong).distinct.sorted
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("inter", graft.functions.JaccardOps.sortedIntersect(col("a"), col("b")))
    val got = df.select("id", "inter").as[(Long, Long)].collect().toMap
    rows.foreach { case (i, a, b) =>
      assert(got(i) == (a.toSet & b.toSet).size.toLong, s"row $i")
    }
  }
}
