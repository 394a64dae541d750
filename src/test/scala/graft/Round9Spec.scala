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
}
