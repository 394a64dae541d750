package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Prefix-filtered exact set-similarity join (dedup_jaccard_prefix):
  * losslessness against the brute-force operator, pruning power on a
  * stop-shingle-skewed corpus, and the prefix lemma's edge shapes. */
class PrefixJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("prefix-filtered all-pairs == quadratic operator, bit-equal (sf0.001)") {
    val pfx = TextOps.dedupJaccardPrefix(spark, sfDir).collect().toSeq
    val quad = TextOps.dedupNgramJaccard(spark, sfDir).collect().toSeq
    assert(pfx == quad, s"prefix join diverged: ${pfx.size} vs ${quad.size} rows")
    assert(pfx.nonEmpty, "gate corpus has no near-dup pairs — spec is vacuous")
  }

  test("stop-shingle corpus: prefix index prunes the df² pair-event melt, losslessly") {
    // 40 docs all share one universal trigram ("aa bb cc") but are
    // otherwise unique → every cross pair is J < 0.5; plus one planted
    // near-identical pair (J ≥ 0.5). The full inverted index generates
    // all 40·39/2 = 780 pair events off the stop shingle alone; the
    // prefix index must stay near the true near-dup density.
    val docs = (0 until 40).map { i =>
      (i.toLong, "s", s"aa bb cc w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g")
    } :+ (100L, "s", "aa bb cc w0a w0b w0c w0d w0e w0f w0g x")
    val d = docs.toDF("doc_id", "source", "text")
    val t = TextOps.shingled(d)
    // full (uncapped) inverted-index pair events for comparison
    val posting = t.select(col("doc_id"), col("source"), explode(col("sh")).as("shh"))
    val fullPairs = posting.alias("x").join(posting.alias("y"),
        col("x.shh") === col("y.shh") && col("x.source") === col("y.source") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
    val candPairs = TextOps.prefixCandidates(t).count()
    assert(fullPairs >= 780L, s"stop shingle should pair everything: $fullPairs")
    // the universal shingle never enters any doc's rarity prefix, so
    // candidates collapse to pairs sharing a RARE shingle
    assert(candPairs < fullPairs / 10,
      s"prefix index did not prune the stop shingle: $candPairs vs $fullPairs")
    // and the qualifying pair still survives
    val res = TextOps.jaccardPrefixPairs(d).collect()
    assert(res.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 100L)),
      s"lost or invented a pair: ${res.mkString(", ")}")
  }

  test("containment join: finds the quoted doc one-way; stop shingles still pruned") {
    // doc 1 = 10 unique shingle-words + quoted inside doc 2 (which has
    // 30 more); J(1,2) ≈ 0.29 (below any jaccard gate) but C(1⊂2) = 1.
    // Every doc also carries a universal stop trigram.
    val quote = (0 until 12).map(i => s"q$i").mkString(" ")
    val d = (Seq(
      (1L, "s", s"zz yy xx $quote"),
      (2L, "s", s"zz yy xx $quote " + (0 until 30).map(i => s"b$i").mkString(" "))) ++
      (10 until 40).map(i =>
        (i.toLong, "s", s"zz yy xx " + (0 until 12).map(j => s"w${i}_$j").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val res = TextOps.containmentPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // 1 ⊂ 2 found with high containment; 2 ⊄ 1
    assert(res.exists { case (a, b, c) => a == 1L && b == 2L && c >= 0.9 },
      s"missed the quoted doc: ${res.mkString(", ")}")
    assert(!res.exists { case (a, b, _) => a == 2L && b == 1L },
      "containment direction leaked: the long doc is not inside the short one")
    // the universal 'zz yy xx' shingles never pair the unrelated docs
    assert(res.forall { case (a, b, _) => Set(a, b).subsetOf(Set(1L, 2L)) },
      s"stop shingles generated false pairs: ${res.mkString(", ")}")
  }

  test("random corpora: both prefix joins match a driver-side brute-force reference") {
    val rng = new scala.util.Random(1234)
    def shingles(text: String): Set[String] = {
      val toks = text.split(" ").filterNot(_.isEmpty)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    for (trial <- 1 to 5) {
      val vocab = 30 + rng.nextInt(40)
      val base = (0 until 50).map { i =>
        val n = 3 + rng.nextInt(18)
        (i.toLong, "s" + rng.nextInt(2),
          Seq.fill(n)("w" + rng.nextInt(vocab)).mkString(" "))
      }
      // plant mutated copies so thresholds actually fire
      val dups = (0 until 8).map { j =>
        val (id, src, text) = base(rng.nextInt(base.size))
        val words = text.split(" ").toBuffer
        if (rng.nextBoolean() && words.size > 4) words.remove(rng.nextInt(words.size))
        (100L + j, src, words.mkString(" "))
      }
      val all = base ++ dups
      val d = all.toDF("doc_id", "source", "text")
      val sets = all.map { case (id, src, t) => (id, src, shingles(t)) }
        .filter(_._3.nonEmpty)
      // brute-force references on string shingle sets
      val wantJ = (for {
        (a, sa, ta) <- sets; (b, sb, tb) <- sets
        if sa == sb && a < b
        inter = (ta & tb).size; union = ta.size + tb.size - inter
        if union > 0 && inter.toDouble / union >= 0.5
      } yield ((a, b), inter.toDouble / union)).toMap
      val wantC = (for {
        (a, sa, ta) <- sets; (b, sb, tb) <- sets
        if sa == sb && a != b
        c = (ta & tb).size.toDouble / ta.size
        if c >= 0.9
      } yield ((a, b), c)).toMap
      val gotJ = TextOps.jaccardPrefixPairs(d).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
      val gotC = TextOps.containmentPairs(d).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
      assert(gotJ == wantJ, s"trial $trial jaccard mismatch: got $gotJ want $wantJ")
      assert(gotC == wantC, s"trial $trial containment mismatch: got $gotC want $wantC")
    }
  }

  test("below-threshold pairs verify out; identical docs score exactly 1.0") {
    val d = Seq(
      (1L, "s", "p q r s t u v w"),          // J(1,2) = 1 (identical)
      (2L, "s", "p q r s t u v w"),
      (3L, "s", "p q r zz yy xx ww vv"),     // shares only 'p q r' with 1 → J < 0.5
      (4L, "t", "p q r s t u v w")           // other source block — never paired
    ).toDF("doc_id", "source", "text")
    val res = TextOps.jaccardPrefixPairs(d).collect()
    assert(res.length == 1 && res(0).getLong(0) == 1L && res(0).getLong(1) == 2L)
    assert(res(0).getDouble(3) == 1.0)
  }
}
