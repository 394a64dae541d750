package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

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
      Thread.sleep(500) // let any stray job-start events drain
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
    // the budget invariant: per-source running totals never exceed the
    // corpus-derived budget (cum_tokens is the inclusive running sum)
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val cums = rows.map(_.getLong(3))
      assert(cums.distinct.length == cums.length, s"$src: duplicate running totals")
    }
  }
}
