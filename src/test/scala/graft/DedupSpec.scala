package graft

import graft.operators.Dedup

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
    "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "pi", "rho")
  def doc(seed: Int, n: Int): String =
    (0 until n).map(i => vocab((graft.functions.TextHash.mix64(seed * 1000L + i) % vocab.size).toInt.abs)).mkString(" ")

  lazy val docs = {
    val base = (0 until 40).map(i => (i.toLong, doc(i, 30)))
    // plant: 100 = copy of 0; 101 = near-copy of 1 (one word changed)
    val nearCopy = doc(1, 30).split(" ").updated(15, "CHANGED").mkString(" ")
    (base :+ (100L, doc(0, 30)) :+ (101L, nearCopy)).toDF("doc_id", "text")
  }

  test("minhash LSH finds planted exact and near duplicates, nothing else") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text")
      .select($"doc_a", $"doc_b", $"jaccard").as[(Long, Long, Double)].collect()
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 100L)), s"exact dup missed: ${keys.mkString(",")}")
    assert(keys.contains((1L, 101L)), "near dup missed")
    val exact = pairs.find(p => p._1 == 0L && p._2 == 100L).get
    assert(exact._3 == 1.0)
    val near = pairs.find(p => p._1 == 1L && p._2 == 101L).get
    assert(near._3 >= 0.5 && near._3 < 1.0)
    // no false positives among unrelated docs
    assert(keys.forall(k => k == ((0L, 100L)) || k == ((1L, 101L))))
  }

  test("simhash: identical docs at hamming 0; near-copy within threshold") {
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text")
      .select($"doc_a", $"doc_b", $"hamming").as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m.get((0L, 100L)).contains(0), s"exact dup not at hamming 0: $m")
    assert(m.get((1L, 101L)).exists(_ <= Dedup.SimHashMaxHamming), "near dup beyond threshold")
  }

  test("semdedup: planted copies drop with dup_of = original; originals keep; witnesses share a cluster") {
    val out = Dedup.semDedup(spark, sfDir)
      .select($"vec_id", $"centroid", $"keep", $"dup_of")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getBoolean(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    val byId = out.map(t => t._1 -> t).toMap
    (0L until Dedup.SemPlantN).foreach { i =>
      val copy = byId(i + Dedup.SemPlantBase)
      assert(!copy._3, s"planted copy of $i kept")
      assert(copy._4 <= i, s"dup_of for copy of $i is ${copy._4}, later than original")
      // the witness lives in the same cluster as the copy
      assert(byId(copy._4)._2 == copy._2, s"witness cluster mismatch for copy of $i")
    }
    // keep rule is positional: every dup_of points to an EARLIER kept-or-dropped row
    out.filter(t => !t._3).foreach { t =>
      assert(t._4 >= 0 && t._4 < t._1, s"bad witness for ${t._1}")
    }
  }

  test("semDedupOn: hand-built corpus — first of an identical group keeps, rest drop to it; singletons keep") {
    val v1 = Seq.fill(4)(1.0) ++ Seq.fill(60)(0.0)
    val v2 = Seq.fill(60)(0.0) ++ Seq.fill(4)(-1.0)
    val corpus = Seq(
      (10L, v1), (11L, v1), (12L, v1), // identical trio
      (20L, v2)                        // singleton, far away
    ).toDF("vec_id", "embedding")
    val cents = Array(v1.toArray, v2.toArray)
    val got = Dedup.semDedupOn(corpus, cents, 0.9)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == Seq((10L, true, -1L), (11L, false, 10L),
      (12L, false, 10L), (20L, true, -1L)), got.toString)
  }

  test("minhash signature is deterministic and length-k") {
    val sig = graft.functions.TextHash.minhash(
      Iterator("a b c".getBytes, "b c d".getBytes), 32)
    val sig2 = graft.functions.TextHash.minhash(
      Iterator("a b c".getBytes, "b c d".getBytes), 32)
    assert(sig.length == 32 && sig.toSeq == sig2.toSeq)
    // adding a shingle can only lower (or keep) each signature slot
    val sig3 = graft.functions.TextHash.minhash(
      Iterator("a b c".getBytes, "b c d".getBytes, "x y z".getBytes), 32)
    assert(sig.zip(sig3).forall { case (s, s3) => s3 <= s })
  }
}
