package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("trainMerges: hand-computed merges on a tiny dictionary") {
    // freqs: "aab" x5, "ab" x3  →  round 1 pairs: (a,a)=5, (a,b)=8 → merge (a,b)
    // round 2: segs "a ab" x5, "ab" x3 → pairs: (a,ab)=5 → merge (a,ab)
    val words = Array(("aab", 5L), ("ab", 3L))
    val got = Bpe.trainMerges(words, 3)
    assert(got.take(2) == Seq((1, "a", "b", 8L), (2, "a", "ab", 5L)), got.toString)
    // round 3: only "aab" fully merged? segs: "aab" x5, "ab" x3 — no pairs left
    assert(got.length == 2, s"dictionary exhausted after 2 merges: $got")
  }

  test("applyMerge is the left-to-right non-overlapping scan (framed form)") {
    assert(Bpe.applyMerge(Bpe.frame("aaa"), "a", "a") == "|aa||a|")
    assert(Bpe.applyMerge(Bpe.frame("abab"), "a", "b") == "|ab||ab|")
    assert(Bpe.applyMerge(Bpe.frame("aab"), "a", "b") == "|a||ab|")
    // fused symbols never re-match
    assert(Bpe.applyMerge("|ab||ab|", "a", "b") == "|ab||ab|")
    // tie-break scan: merged left symbol blocks the overlapping pair
    assert(Bpe.applyMerge(Bpe.frame("aaaa"), "a", "a") == "|aa||aa|")
    assert(Bpe.applyMerge(Bpe.frame("aaaaa"), "a", "a") == "|aa||aa||a|")
  }

  test("bpe_train on the corpus: rounds sequential, counts non-increasing never guaranteed but positive; tokens concatenate") {
    val df = Bpe.bpeTrain(spark, sfDir)
      .as[(Int, String, String, String, Long)].collect()
    assert(df.length == Bpe.Merges)
    assert(df.map(_._1).toSeq == (1 to Bpe.Merges))
    df.foreach { case (_, l, r, tok, c) =>
      assert(tok == l + r && c > 0)
    }
  }

  test("bpe_encode: token count bounded by chars and words; merges strictly compress the corpus") {
    val enc = Bpe.bpeEncode(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(enc.nonEmpty)
    enc.foreach { case (id, w, c, t) =>
      assert(t <= c, s"doc $id: tokens $t > chars $c")
      assert(w == 0 || t >= w, s"doc $id: tokens $t < words $w")
    }
    val chars = enc.map(_._3).sum
    val toks = enc.map(_._4).sum
    assert(toks < chars, s"no compression: $toks tokens vs $chars chars")
  }

  test("spark-side encode segmentation == driver applyMerge chain, word for word") {
    val docs = Tables.load(spark, sfDir, "documents")
    val merges = {
      Bpe.bpeTrain(spark, sfDir).collect() // ensure trained
      Bpe.trainMerges(Bpe.wordFreq(docs), Bpe.Merges).map(t => (t._2, t._3))
    }
    val segSql = merges.foldLeft(
      "concat('|', array_join(split(word, '(?=.)'), '||'), '|')") {
      case (acc, (l, r)) => s"replace($acc, '|$l||$r|', '|$l$r|')"
    }
    val sample = docs.limit(50)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .withColumn("s", expr(segSql))
      .as[(String, String)].collect()
    assert(sample.nonEmpty)
    sample.foreach { case (w, s) =>
      val expect = merges.foldLeft(Bpe.frame(w)) {
        case (seg, (l, r)) => Bpe.applyMerge(seg, l, r)
      }
      assert(s == expect, s"word '$w': spark '$s' vs driver '$expect'")
    }
  }
}
