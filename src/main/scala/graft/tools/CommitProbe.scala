package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Commit-protocol probe for the partitioned index write path: runs
  * under local[4, 3] (task retries ON — the shared test session's
  * local[4] cannot retry, so this runs in its own JVM, launched by
  * CommitProtocolSpec) and injects a FIRST-ATTEMPT task failure into
  * the write stage after the failing task has already handed rows to
  * the parquet writer. The scheduler retries the task; the file
  * committer must discard the dead attempt's partial output and
  * commit the retry exactly once — the layout read back must hold
  * every corpus row exactly once (no loss from the failure, no
  * duplication from the two attempts), with partition pruning intact.
  * This is the semantics task retry AND speculation both rely on:
  * attempt output is quarantined in the attempt dir until commit.
  *
  * Prints COMMIT_PROBE_OK on success; any violation exits nonzero. */
object CommitProbe {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val spark = SparkSession.builder().master("local[4,3]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = graft.operators.IvfIndex.trainCentroids(
      graft.operators.IvfIndex.trainSample(emb), 8, 5)
    val assigned = graft.operators.IvfIndex.assign(emb, centroids)
      .select($"vec_id", $"embedding", $"centroid")

    // NOTE: accumulator updates from FAILED tasks are dropped (user
    // accumulators have countFailedValues=false), so the evidence that
    // the injection fired is the RETRY: attemptNumber > 0 only ever
    // runs because attempt 0 died.
    val retried = spark.sparkContext.longAccumulator("retried_tasks")
    val flaky = assigned.as[(Long, Seq[Double], Int)].mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.partitionId() == 0) {
        if (tc.attemptNumber() == 0) {
          var n = 0
          it.map { r =>
            n += 1
            // die mid-stream: ~100 rows are already in the attempt's
            // parquet writer when the task fails
            if (n == 100 || !it.hasNext)
              throw new RuntimeException("injected first-attempt failure")
            r
          }
        } else { retried.add(1L); it }
      } else it
    }.toDF("vec_id", "embedding", "centroid")

    flaky.write.partitionBy("centroid").mode("overwrite").parquet(out)

    val want = assigned.select($"vec_id", $"centroid")
      .as[(Long, Int)].collect().sorted.toSeq
    val got = spark.read.parquet(out)
      .select($"vec_id", $"centroid".cast("int"))
      .as[(Long, Int)].collect().sorted.toSeq

    def fail(msg: String): Nothing = { System.err.println(s"COMMIT_PROBE_FAIL: $msg"); sys.exit(1) }
    if (retried.value < 1L) fail("no task retry observed — the injection never fired")
    if (got.size != got.distinct.size) fail("duplicate rows: dead attempt output was committed")
    if (got != want) fail(s"row set mismatch: got ${got.size}, want ${want.size}")
    val plan = spark.read.parquet(out).filter($"centroid" === 0)
      .queryExecution.executedPlan.toString
    if (!plan.contains("PartitionFilters")) fail("committed layout lost partition pruning")
    println(s"COMMIT_PROBE_OK rows=${got.size} retried=${retried.value}")
    spark.stop()
  }
}
