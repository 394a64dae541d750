package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.operators.{BinaryQuant, Bm25, IvfIndex, Mmr, ServeE2e}

/** serve_e2e — the composed serving stack. The properties the
  * per-operator gate cannot show: one request's dataflow over the
  * at-rest indexes composes lazily (zero jobs after serve start-up +
  * probe routing) and its plan is the serving plan — no base-table
  * scan on the retrieval side, pruned code-only dense candidates,
  * no SortMergeJoin. */
class ServeE2eSpec extends SparkTestBase {

  /** Serve start-up (layouts built + opened) and one request's probe
    * routing — everything BEFORE the request-path contract applies. */
  private def warmAndRoute() = {
    val sparseIdx = Bm25.layoutFor(spark, sfDir)
    val (denseIdx, centroids) = ServeE2e.denseLayoutFor(spark, sfDir)
    val idx = ServeE2e.openIndexes(spark, sparseIdx, denseIdx)
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < Bm25.NQueriesB)
    val qRows = queries.select(col("vec_id").cast("long"),
      col("embedding").cast(ArrayType(DoubleType))).collect()
    val probes = qRows.flatMap { r =>
      IvfIndex.nearestN(centroids, r.getSeq[Double](1).toArray,
        BinaryQuant.IvfNprobe).map(c => (r.getLong(0), c))
    }.toSeq
    val qv = queries.select(col("vec_id").as("qid"),
      col("embedding").cast(ArrayType(DoubleType)).as("qv"))
    (idx, probes, qv, emb)
  }

  test("after serve start-up and probe routing, building the full request plan launches zero Spark jobs") {
    val (idx, probes, qv, emb) = warmAndRoute()
    val jobs = new AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val df = ServeE2e.serveOver(spark, idx, probes, qv, emb)
      df.queryExecution.optimizedPlan
      org.apache.spark.sql.graftshim.Shims
        .waitListenerBusEmpty(spark.sparkContext, 10000L)
      assert(jobs.get() == 0,
        s"${jobs.get()} Spark job(s) launched while BUILDING the request plan — a driver barrier between stages")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("serve plan census: no documents scan, pruned code-only dense candidates, zero SortMergeJoin") {
    val (idx, probes, qv, emb) = warmAndRoute()
    val df = ServeE2e.serveOver(spark, idx, probes, qv, emb)
    val plan = df.queryExecution.executedPlan.toString
    // sparse side serves the postings layout — the corpus text is
    // never re-tokenized per request
    assert(!plan.contains("documents.parquet"),
      "serve plan scans the documents base table")
    // dense candidates: explicit partition pruning on the coded layout
    assert(plan.contains("PartitionFilters") && plan.contains("centroid"),
      plan.take(800))
    // ... and at least one scan of the coded layout reads codes WITHOUT
    // the float embedding column (the 64x-narrower candidate read)
    val codedScans = plan.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("graft_serve_ivf"))
      .toSeq
    assert(codedScans.nonEmpty, "no coded-layout scan found in the serve plan")
    assert(codedScans.exists(l => l.contains("code") && !l.contains("embedding")),
      codedScans.mkString("\n"))
    // every join is broadcast (query-, vocabulary-, or topK-sized build
    // sides) and the union+aggregate fusion replaced the full-outer SMJ
    assert(!plan.contains("SortMergeJoin"),
      "SortMergeJoin in the serve plan — a shuffle a request should never pay")
  }

  test("served list: 10 diversity-reranked hits per query, drawn from the fused pool, rank-1 = top fused hit") {
    val out = ServeE2e.serveE2e(spark, sfDir).collect()
    val nq = Bm25.NQueriesB
    assert(out.length == nq * Mmr.SelectK,
      s"expected ${nq * Mmr.SelectK} rows, got ${out.length}")
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to Mmr.SelectK),
        s"qid $qid: ranks not 1..${Mmr.SelectK}")
      val ids = rows.map(_.getLong(1))
      assert(ids.distinct.length == ids.length, s"qid $qid: duplicate ids")
    }
    // the greedy's first pick is the fused pool's top row (reranker.py:87
    // semantics carried through mmr_combined)
    val (idx, probes, qv, _) = warmAndRoute()
    val qterms = idx.tf.filter(col("doc_id") < Bm25.NQueriesB)
      .select(col("doc_id").as("qid"), col("word"))
    val bm = Bm25.scoreAndRank(idx.tf, idx.dl, idx.dfT, idx.tot, qterms, Bm25.TopN)
      .select(col("qid"), col("doc_id").as("id"), col("rank").as("bm25_rank"))
    val vec = BinaryQuant.ivfBinaryCodedPlan(idx.coded,
        probes, qv, Bm25.TopN, BinaryQuant.RerankR)
      .select(col("qid"), col("vec_id").as("id"), col("rank").as("vec_rank"))
    val top1 = Bm25.fuseRrf(vec, bm).filter(col("rank") === 1)
      .select("qid", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.filter(_.getInt(2) == 1).foreach { r =>
      assert(top1(r.getLong(0)) == r.getLong(1),
        s"qid ${r.getLong(0)}: MMR rank-1 ${r.getLong(1)} != fused top-1 ${top1(r.getLong(0))}")
    }
  }
}
