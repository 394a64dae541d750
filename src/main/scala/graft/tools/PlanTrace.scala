package graft.tools

import java.io.PrintWriter

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev diagnostic: record the EXECUTED plan of every batch job a
  * registry query fires (actions inside foreachBatch, layout writes,
  * concurrent derived-table jobs) — the plan evidence a composite or
  * streaming operator's `df.explain` cannot show (its returned frame is
  * a detached result / memory-sink scan). Usage:
  *   runMain graft.tools.PlanTrace <sfDir> <outFile> <query> [query...]
  */
object PlanTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pw = new PrintWriter(outFile)
    val seq = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = pw.synchronized {
        pw.println(f"\n== job ${seq.incrementAndGet()}%3d [$funcName] " +
          f"${durationNs / 1e9}%.3f s ==")
        // executed plan, capped: the tree's head carries the shape
        // (exchanges, partition counts, join strategies)
        pw.println(qe.executedPlan.treeString.linesIterator.take(80).mkString("\n"))
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = pw.synchronized {
        pw.println(s"\n== job FAILED [$funcName]: $exception ==")
      }
    }
    spark.listenerManager.register(listener)
    names.foreach { n =>
      pw.println(s"\n======== $n ========")
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      org.apache.spark.sql.graftshim.Shims.waitListenerBusEmpty(spark.sparkContext, 10000L)
    }
    pw.close()
    spark.stop()
  }
}
