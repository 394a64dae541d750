package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Fp16, ShingleHashArr, TextHash, WinnowHashArr}
import org.apache.spark.unsafe.types.UTF8String

/** Property-based checks for the pure kernels (no Spark session).
  * Raw scalacheck Gen sampling (the scalatest bridge isn't in the
  * offline cache); fixed seed sequence → reproducible. */
class PropertySpec extends AnyFunSuite {
  def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }
  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 200).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 100000))
      } f(a, b)
    }

  val finiteFloat: Gen[Float] =
    Gen.chooseNum(-65000f, 65000f).suchThat(f => !f.isNaN && !f.isInfinite)

  test("fp16: round is idempotent and bounded for normal-range floats") {
    forAll(finiteFloat) { f =>
      val r = Fp16.round(f)
      assert(Fp16.round(r) == r, s"not idempotent at $f")
      if (math.abs(f) >= 6.2e-5f) // normal binary16 range
        assert(math.abs(r - f) <= math.abs(f) * math.pow(2, -11).toFloat + 1e-9,
          s"error too large at $f → $r")
    }
  }

  test("fp16: monotone non-decreasing") {
    forAll(finiteFloat, finiteFloat) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      assert(Fp16.round(lo) <= Fp16.round(hi))
    }
  }

  val word: Gen[String] = Gen.choose(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  val text: Gen[String] = Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("shingle hashes: sorted, distinct, and permutation-of-reference") {
    forAll(text) { t =>
      val hs = ShingleHashArr.hashes(UTF8String.fromString(t))
      assert(hs.toSeq == hs.toSeq.sorted, "not sorted")
      assert(hs.toSeq.distinct == hs.toSeq, "not distinct")
      // reference: string shingles hashed independently
      val toks = t.split(" ")
      val expect =
        if (toks.length < 3) Set(TextHash.fnv1a64(t.getBytes("UTF-8")))
        else toks.sliding(3).map(w => TextHash.fnv1a64(w.mkString(" ").getBytes("UTF-8"))).toSet
      assert(hs.toSet == expect)
    }
  }

  test("minhash: identical sets → identical sigs; sig similarity estimates jaccard") {
    forAll(Gen.listOfN(30, word), Gen.listOfN(30, word)) { (a, b) =>
      val ha = a.map(_.getBytes("UTF-8"))
      val hb = b.map(_.getBytes("UTF-8"))
      val sa = TextHash.minhash(ha.iterator, 128)
      val sb = TextHash.minhash(hb.iterator, 128)
      if (a.toSet == b.toSet) assert(sa.toSeq == sb.toSeq)
      else {
        val est = sa.zip(sb).count { case (x, y) => x == y } / 128.0
        val truth = a.toSet.intersect(b.toSet).size.toDouble / a.toSet.union(b.toSet).size
        assert(math.abs(est - truth) <= 0.35, s"est=$est truth=$truth") // 128 hashes → σ≈0.04
      }
    }
  }

  test("winnowing: a substring edit far from a fingerprint region keeps shared fingerprints") {
    forAll(text.suchThat(_.length > 40)) { t =>
      val f1 = WinnowHashArr.fingerprints(UTF8String.fromString(t), 5, 4).toSet
      // identical input → identical output, always
      val f2 = WinnowHashArr.fingerprints(UTF8String.fromString(t), 5, 4).toSet
      assert(f1 == f2)
      assert(f1.nonEmpty)
    }
  }

  test("simhash: equal multisets hash equally; hamming to a disjoint multiset is positive") {
    forAll(Gen.listOfN(20, word)) { ws =>
      val h1 = TextHash.simhash(ws.map(_.getBytes("UTF-8")).iterator, new Array[Int](64))
      val h2 = TextHash.simhash(ws.map(_.getBytes("UTF-8")).iterator, new Array[Int](64))
      assert(h1 == h2)
    }
  }
}
