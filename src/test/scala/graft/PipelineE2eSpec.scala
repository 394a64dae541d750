package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, PipelineOps, TextOps}

/** pipeline_e2e — the composed curation DAG. The property the
  * per-operator gate cannot show: the stages compose as ONE lazy plan
  * with no collect()-shaped seam between them. */
class PipelineE2eSpec extends SparkTestBase {

  test("building the composed pipeline launches zero Spark jobs (no mid-pipeline driver barrier)") {
    // read the input FIRST: the parquet footer/schema job belongs to
    // the scan setup, not to the composition under test
    val docs = Tables.load(spark, sfDir, "documents")
    val jobs = new AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val df = PipelineOps.pipelineE2eOver(docs)
      // force full plan analysis + optimization without execution
      df.queryExecution.optimizedPlan
      // drain the listener bus so a stray job-start can't land after
      // the assert (a fixed sleep here was timing-sensitive)
      org.apache.spark.sql.graftshim.Shims
        .waitListenerBusEmpty(spark.sparkContext, 10000L)
      assert(jobs.get() == 0,
        s"${jobs.get()} Spark job(s) launched while BUILDING the pipeline — a driver barrier between stages")
      assert(df.count() > 0)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("pipeline invariants: survivors are deduped, decontaminated, quality-kept, budgeted, and packed within budget") {
    val out = PipelineOps.pipelineE2e(spark, sfDir).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "duplicate doc_ids in output")
    assert(ids.forall(_ >= Dedup.DecontamEvalMaxId), "eval docs leaked into the training output")
    // the packing invariant: each pack's token sum stays within budget
    // unless a single doc alone exceeds it
    out.groupBy(_.getLong(4)).foreach { case (pack, rows) =>
      val tokens = rows.map(_.getLong(2))
      assert(tokens.sum <= TextOps.PackBudget || rows.length == 1,
        s"pack $pack holds ${tokens.sum} tokens > ${TextOps.PackBudget}")
    }
    // the budget invariant, checked against an INDEPENDENTLY-recomputed
    // budget (the output doesn't carry it): budget = Σ n_tokens over the
    // pre-budget kept set div (2 · distinct sources), and every source's
    // inclusive running total must stay within it
    val kept = PipelineOps.pipelineKept(Tables.load(spark, sfDir, "documents"))
      .select(col("source"), col("n_tokens")).collect()
    val budget = kept.map(_.getLong(1)).sum / (2L * kept.map(_.getString(0)).distinct.length)
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val cums = rows.map(_.getLong(3))
      assert(cums.distinct.length == cums.length, s"$src: duplicate running totals")
      assert(cums.max <= budget,
        s"$src: running total ${cums.max} exceeds the corpus-derived budget $budget")
    }
    // and the budget must actually BIND somewhere, or the filter is
    // untested: the kept set is strictly larger than the survivors
    assert(kept.length > out.length,
      "budget filter dropped nothing — the invariant test has no teeth at this SF")
  }

  test("persistShingles=true (the measured scale variant) is bit-equal to the graded lazy chain") {
    val docs = Tables.load(spark, sfDir, "documents")
    val lazyRows = PipelineOps.pipelineE2eOver(docs).collect().map(_.toSeq).toSeq
    val persisted = PipelineOps.pipelineE2eOver(docs, persistShingles = true)
      .collect().map(_.toSeq).toSeq
    assert(lazyRows.nonEmpty && lazyRows == persisted,
      "persisted-shingle variant diverges from the graded lazy chain")
  }
}
