package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps the two serve_e2e request-stage physical plans (stage 1
  * retrieval, stage 2 bounded MMR point-read) plus the online-terms
  * stage-1 variant, for the PLANS.md census. */
object ServeCensus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.operators.{Bm25, ServeE2e}
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val (idx, probes, qv, _) = ServeE2e.warmAndRoute(spark, dir)
    val fused = ServeE2e.fusedList(spark, idx, probes, qv)
    println("==== STAGE 1: retrieval (off-index terms) ====")
    fused.explain("formatted")
    val rows = fused.collect()
    println("==== STAGE 2: bounded MMR point-read ====")
    ServeE2e.mmrOverFetched(spark, idx.embById, rows).explain("formatted")
    val terms = ServeE2e.onlineTermsFor(idx)
    println("==== STAGE 1 (ONLINE terms) ====")
    ServeE2e.fusedListOnline(spark, idx, probes, qv, terms).explain("formatted")
    spark.stop()
  }
}
