package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Knn}
import graft.plans.GraftRules

class EdgeCaseSpec extends SparkTestBase {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("kNN with empty corpus returns no rows") {
    val empty = emb.filter($"vec_id" < 0)
    assert(Knn.topK(empty, emb.filter($"vec_id" < 3), 5).count() == 0)
  }

  test("kNN with empty query set returns no rows") {
    assert(Knn.topK(emb, emb.filter($"vec_id" < 0), 5).count() == 0)
  }

  test("kNN with k larger than corpus returns the whole corpus ranked") {
    val tiny = emb.filter($"vec_id" < 4)
    val res = Knn.topK(tiny, tiny.filter($"vec_id" === 0), 100)
    assert(res.count() == 4)
    assert(res.agg(max($"rank")).head.getInt(0) == 4)
  }

  test("minhash dedup on a single-doc corpus yields no pairs") {
    val one = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    assert(Dedup.minhashNearDups(one, "doc_id", "text").count() == 0)
  }

  test("connected components of an empty pair set is empty") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
  }

  test("fp16 idempotence rule collapses nested rounds in the optimized plan") {
    GraftRules.install(spark)
    import graft.functions.VectorOps
    val df = emb.select(VectorOps.fp16(VectorOps.fp16($"embedding")).as("v"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("fp16roundarr".r.findAllIn(optimized.toLowerCase).size == 1, optimized)
    // and results equal the single application
    val single = emb.select(VectorOps.fp16($"embedding").as("v"))
    assert(df.collect().map(_.getSeq[Float](0)).toSeq ==
      single.collect().map(_.getSeq[Float](0)).toSeq)
  }

  test("shingle hashes are whitespace-normalized: multi-space == single-space") {
    import graft.functions.ShingleHashArr
    import org.apache.spark.unsafe.types.UTF8String
    def h(t: String) = ShingleHashArr.hashes(UTF8String.fromString(t)).toSeq
    assert(h("a  b \u0020  c d") == h("a b c d"))
    assert(h(" a b c ") == h("a b c"))
    // <3 tokens: one whole-normalized-text shingle
    assert(h("a  b").length == 1 && h("a  b") == h("a b"))
    assert(h("").length == 1)
  }

  test("dedup_ngram_jaccard drops <3-token docs on the engine side (oracle parity)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType), StructField("lang", StringType),
      StructField("n_chars", IntegerType)))
    val rows = java.util.Arrays.asList(
      Row(1L, "s", "one two", "en", 7),       // <3 tokens: excluded
      Row(2L, "s", "one two", "en", 7),       // identical short doc
      Row(3L, "s", "alpha beta gamma delta", "en", 22),
      Row(4L, "s", "alpha beta gamma delta", "en", 22))
    val docs = spark.createDataFrame(rows, schema)
    // mirror the operator body: same filter, same shingles, same threshold
    val d = docs.filter(expr("size(filter(split(text, ' '), x -> x != '')) >= 3"))
      .select(col("doc_id"), Dedup.shingleHashes3(col("text")).as("sh"))
    val pairs = d.alias("a").join(d.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", graft.functions.JaccardOps.sortedJaccard(col("a.sh"), col("b.sh")))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 4L)), s"got $pairs")
  }

  test("bm25 tolerates degenerate corpora: empty-text docs, a universal term, a single query doc") {
    import graft.operators.Bm25
    import spark.implicits._
    // corpus A: 'common' appears in EVERY doc -> idf exactly 0, so a
    // doc sharing only 'common' scores exactly 0
    val a = Seq(
      (0L, "common alpha beta"),
      (1L, "common alpha xyz"),
      (2L, "common pqr stu"))
      .toDF("doc_id", "text")
    val outA = Bm25.bm25TopN(a, 10).filter($"qid" === 0L)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(outA(0L) == outA.values.max, "self-match not maximal")
    assert(outA(1L) > 0L, "alpha (idf>0) should contribute")
    assert(outA.getOrElse(2L, 0L) == 0L,
      s"a universal term must contribute exactly 0, got ${outA.get(2L)}")
    // corpus B: an empty-text doc (token set {''}) — pipeline doesn't
    // crash and the empty doc matches nobody's query terms
    val b = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha delta eps"),
      (2L, ""))
      .toDF("doc_id", "text")
    val outB = Bm25.bm25TopN(b, 10).filter($"qid" === 0L)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(outB(0L) == outB.values.max)
    assert(outB.getOrElse(2L, 0L) == 0L, "empty doc should match nothing")
  }

  test("rrf fusion with one empty side degrades to the other side's ranking") {
    import graft.operators.Bm25
    import spark.implicits._
    val vec = Seq((0L, 5L, 1), (0L, 6L, 2)).toDF("qid", "id", "vec_rank")
    val bm = Seq.empty[(Long, Long, Int)].toDF("qid", "id", "bm25_rank")
    val fused = Bm25.fuseRrf(vec, bm)
      .select("id", "rank").as[(Long, Int)].collect().toSeq
    assert(fused == Seq((5L, 1), (6L, 2)), fused.toString)
  }

  test("rrf fusion fails loudly on a duplicate (qid, id) within one rank list") {
    // the union+aggregate rewrite would otherwise silently max-pick one
    // rank from a duplicated key — the assert_true inside the rrf
    // expression turns that contract break into an execution failure
    import graft.operators.Bm25
    import spark.implicits._
    val vec = Seq((0L, 5L, 1), (0L, 5L, 2)).toDF("qid", "id", "vec_rank")
    val bm = Seq((0L, 6L, 1)).toDF("qid", "id", "bm25_rank")
    val ex = intercept[Exception] { Bm25.fuseRrf(vec, bm).collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("duplicate (qid, id)")),
      s"expected the fuseRrf dup-key assert, got: $ex")
  }

  test("winnow fingerprint count matches the distinct-window-minima formula") {
    import graft.functions.{TextHash, WinnowHashArr}
    import org.apache.spark.unsafe.types.UTF8String
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val got = WinnowHashArr.fingerprints(UTF8String.fromString(t), 5, 4).length
    // independent recomputation: distinct minima (unsigned) of each
    // 4-gram-hash window over character 5-grams
    val grams = (0 to t.length - 5)
      .map(i => TextHash.md5Lower64(t.substring(i, i + 5).getBytes("UTF-8")))
    val minima = grams.sliding(4).map(_.minBy(x => x ^ Long.MinValue)).toSet
    assert(got == minima.size)
  }
}
