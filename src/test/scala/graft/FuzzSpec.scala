package graft
import graft.operators.BinaryQuant
class FuzzSpec extends SparkTestBase {
  test("ScoredTopR fuzz vs sort") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 300) {
      val n = 1 + rng.nextInt(3000)
      val r = 1 + rng.nextInt(500)
      val ids = rng.shuffle((0L until 100000L).toVector).take(n)
      val xs = ids.map(id => (rng.nextInt(20).toDouble / 7.0, id)).toArray
      val h = new BinaryQuant.ScoredTopR(r)
      xs.foreach { case (s, id) => if (h.wouldAccept(s, id)) h.offer(s, id, s * 2) }
      val got = { val b = scala.collection.mutable.ArrayBuffer.empty[(Double, Long, Double)]
        h.foreach((s, i, c) => b += ((s, i, c))); b.sortBy { case (s, i, _) => (-s, i) }.toSeq }
      val want = xs.sortBy { case (s, i) => (-s, i) }.take(math.min(r, n))
        .map { case (s, i) => (s, i, s * 2) }.toSeq
      assert(got == want, s"trial $trial n=$n r=$r")
    }
  }
  test("HammingTopR fuzz vs sort") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 300) {
      val n = 1 + rng.nextInt(3000)
      val r = 1 + rng.nextInt(500)
      val ids = rng.shuffle((0L until 100000L).toVector).take(n)
      val xs = ids.map(id => (rng.nextInt(12), id)).toArray
      val h = new BinaryQuant.HammingTopR(r)
      xs.foreach { case (s, id) => if (h.wouldAccept(s, id)) h.offer(s, id, s * 2.0) }
      val got = { val b = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
        h.foreach((s, i, c) => b += ((s, i, c))); b.sortBy { case (s, i, _) => (s, i) }.toSeq }
      val want = xs.sortBy { case (s, i) => (s, i) }.take(math.min(r, n))
        .map { case (s, i) => (s, i, s * 2.0) }.toSeq
      assert(got == want, s"trial $trial n=$n r=$r")
    }
  }
}
