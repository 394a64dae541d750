package graft

import graft.operators.Mmr

class MmrSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed MMR on 2-D candidates (λ=0.5)") {
    // Candidates: a=(1,0) rel=1.0 (rank 1); b≈a rel=0.9 (near-dup);
    // c=(0,1) rel=0.6 (orthogonal, diverse).
    // Pick 1: a (top rank, reranker.py:87).
    // Pick 2: MMR(b)=0.5·0.9−0.5·cos(b,a)≈0.45−0.5 <0;
    //         MMR(c)=0.5·0.6−0.5·0 = 0.3 → c.
    // Pick 3: b.
    val a = Array(1.0, 0.0)
    val b = Array(0.9999, 0.0141)
    val c = Array(0.0, 1.0)
    val cands = Array((1L, 1.0, a), (2L, 0.9, b), (3L, 0.6, c))
    val picked = Mmr.select(cands, 3, 0.5).map(_._1).toSeq
    assert(picked == Seq(1L, 3L, 2L), s"got $picked")
  }

  test("MMR never returns duplicates and respects k") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val res = Mmr.rerank(emb, emb.filter($"vec_id" < 5))
    val rows = res.select($"qid", $"vec_id").as[(Long, Long)].collect()
    val perQ = rows.groupBy(_._1)
    assert(perQ.size == 5)
    perQ.foreach { case (_, xs) =>
      assert(xs.length == Mmr.SelectK)
      assert(xs.map(_._2).distinct.length == xs.length)
    }
  }

  test("top-1 MMR pick is the top-relevance candidate") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val res = Mmr.rerank(emb, emb.filter($"vec_id" < 5))
      .filter($"mmr_rank" === 1)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
    res.foreach { case (q, id) => assert(q == id) } // self is most relevant
  }
}
