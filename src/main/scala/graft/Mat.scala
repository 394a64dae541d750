package graft

import org.apache.spark.sql.DataFrame

/** Materialization + temp-dir hygiene for the graded at-rest-layout
  * queries. Those queries write a table to a scratch directory, read
  * it back, and return a result that would otherwise keep the scratch
  * files live for the caller's lazy evaluation — so the directories
  * could never be deleted and accumulated across bench/grade runs
  * (each query runs 3× per bench). `detach` collects the SMALL graded
  * result (top-k per query / few-group aggregate / corpus-at-graded-SF
  * assignment — never 100 TB-shaped; the scale path keeps data
  * distributed) and rebuilds it as a local relation with the identical
  * schema, after which the scratch dir is deleted in a finally block.
  */
object Mat {
  /** Collect a small result and rebuild it as a session-local
    * DataFrame with the same schema, detached from any backing files. */
  def detach(df: DataFrame): DataFrame = {
    val rows = java.util.Arrays.asList(df.collect(): _*)
    df.sparkSession.createDataFrame(rows, df.schema)
  }

  /** Run independent Spark actions concurrently and propagate the first
    * failure. Small fixed pool: enough to overlap job/commit latencies,
    * not enough to contend for executors (guide §2.6). Shared inputs
    * must be materialized (persist + count / checkpoint) BEFORE the
    * concurrent section so the branches read, not race to compute.
    * On failure the outstanding siblings are cancelled and awaited so
    * the caller's cleanup (finally unpersist/delete) never races a
    * still-running branch. */
  def concurrently(fs: (() => Unit)*): Unit = {
    if (fs.isEmpty) return
    val pool = java.util.concurrent.Executors.newFixedThreadPool(fs.size)
    val futs = fs.map(f => pool.submit(new java.util.concurrent.Callable[Unit] {
      override def call(): Unit = f()
    }))
    try {
      futs.foreach(_.get())
    } catch {
      case e: java.util.concurrent.ExecutionException =>
        futs.foreach(_.cancel(true))
        pool.shutdownNow()
        pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
        throw e.getCause
    } finally pool.shutdown()
  }

  /** Shuffle-partition count for an iterative loop, derived from the
    * loop's MATERIALIZED working-set row count instead of the session's
    * corpus-scan constant (guide §2: scale-adaptive partitioning, done
    * by hand because a superstep's per-round exchanges are tiny-task
    * overhead AQE's coalescing floor never shrinks below the session
    * parallelism). ceil(rows / rowsPerPartition) capped at the session
    * parallelism: a corpus-scale graph saturates the cap, a small
    * component/kNN graph stops paying 32 state-of-nothing tasks per
    * round. Deployment knob: spark.graft.loop.rowsPerPartition
    * (default 8192 rows per shuffle partition — the streaming
    * replay's measured sweet spot for row-shaped state). */
  def loopPartitions(spark: org.apache.spark.sql.SparkSession, nRows: Long): Int = {
    val cap = spark.sessionState.conf.numShufflePartitions
    val target = spark.conf.getOption("spark.graft.loop.rowsPerPartition")
      .map(_.toLong).filter(_ > 0).getOrElse(8192L)
    math.max(1L, math.min(cap.toLong, (nRows + target - 1) / target)).toInt
  }

  /** Run an iterative loop body with `spark.sql.shuffle.partitions`
    * sized by loopPartitions, restoring the session value after. The
    * body must MATERIALIZE its result before returning (eager
    * localCheckpoint / per-round actions): a plan left lazy executes
    * under the caller's restored conf and gains nothing. Nested calls
    * are a pass-through — the outer scope's sizing (from the larger,
    * enclosing working set) stays in force; sequential calls are the
    * supported composition. NOT safe from concurrent branches (the
    * conf is session-global) — Mat.concurrently callers must size
    * partitions before the concurrent section. */
  def withLoopPartitions[T](spark: org.apache.spark.sql.SparkSession, nRows: Long)
                           (body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val stash = "spark.graft.loop.outerPartitions"
    if (spark.conf.getOption(stash).isDefined) return body
    val old = spark.conf.get(key)
    spark.conf.set(stash, old)
    spark.conf.set(key, loopPartitions(spark, nRows).toString)
    try body finally { spark.conf.set(key, old); spark.conf.unset(stash) }
  }

  private val fanoutCtr = new java.util.concurrent.atomic.AtomicLong(0L)
  /** Fan a compute-dense input out to the session's full parallelism
    * BEFORE its heavy projection. Small or unsplittable inputs (a
    * single-row-group parquet shard, a MemoryStream batch, an
    * AQE-coalesced exchange) arrive as one-to-few partitions, so a
    * following per-row-heavy map (md5 shingling, 32-lane minhash
    * signatures, media decode) runs on one core no matter how many the
    * session has — guide §2.5's unsplittable-input skew, fixed by its
    * prescription: repartition immediately after the read. The exchange
    * moves the raw rows once; callers apply it only where per-row
    * compute dominates that exchange cost (it is NOT a blanket
    * post-scan step — a plain columnar scan must stay exchange-free).
    * Inside a streaming replay the session's shuffle-partition conf is
    * the input-derived STATE partition count (sized for state-store
    * commit cost, not for map compute), so the pre-override parallelism
    * is read from the stash withStreamPartitions leaves. */
  def fanout(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val n = s.conf.getOption("spark.graft.stream.sessionParallelism")
      .orElse(s.conf.getOption("spark.graft.loop.outerPartitions"))
      .map(_.toInt).filter(_ > 0)
      .getOrElse(s.sessionState.conf.numShufflePartitions)
    // CollapseProject pushes a deterministic Project THROUGH a bare
    // Repartition (to shuffle fewer bytes) — which would move the heavy
    // map back below the exchange onto the single input partition,
    // undoing the fan-out. An `observe` (CollectMetrics) node between
    // the exchange and the projection is a fence no project-pushdown
    // rule crosses; its count aggregate is a few ns per row.
    df.repartition(n)
      .observe(s"graft_fanout_${fanoutCtr.incrementAndGet()}",
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)))
  }

  def deleteRecursively(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      // Files.walk holds open directory handles until closed; this runs
      // per scratch-dir query (3x each per bench), so an unclosed stream
      // would leak FDs for the life of the JVM.
      val st = java.nio.file.Files.walk(root)
      try {
        st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      } finally st.close()
    }
  }

  /** Fresh scratch dirs for the duration of `body`; the body must
    * return a DETACHED (already-materialized) result. Dirs are removed
    * even on failure. */
  def withScratchDirs[T](prefixes: String*)(body: Seq[String] => T): T = {
    val dirs = prefixes.map(p =>
      java.nio.file.Files.createTempDirectory(s"graft_$p").toString)
    try body(dirs) finally dirs.foreach(deleteRecursively)
  }

  /** Run `body` with a task-level input-bytes accumulator attached and
    * return (result, bytesRead) — the IO-not-wall measurement the scale
    * probes and the point-read IO pins share. Drains the listener bus
    * before detaching so late task-end events are never under-counted. */
  def withBytesRead[T](sc: org.apache.spark.SparkContext)(body: => T): (T, Long) = {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          bytes.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
    }
    sc.addSparkListener(l)
    try {
      val r = body
      org.apache.spark.sql.graftshim.Shims.waitListenerBusEmpty(sc, 10000L)
      (r, bytes.get())
    } finally sc.removeSparkListener(l)
  }

  /** JVM-lifetime scratch dir for a build-once SERVE layout, through
    * the Hadoop FileSystem API only (the serve paths must stay
    * deployable against any Hadoop FS — no java.io/java.nio path ops):
    * created under `hadoop.tmp.dir`, removed at JVM exit by a
    * shutdown hook registered with Hadoop's own ShutdownHookManager at
    * a priority ABOVE the FileSystem cache-close hook — fs.deleteOnExit
    * alone is only processed when the CACHED client closes, so a
    * deployment that disables the FS cache (fs.<scheme>.impl.disable
    * .cache=true) would silently leak every corpus-sized layout. */
  def hadoopScratchDir(s: org.apache.spark.sql.SparkSession, prefix: String): String = {
    val conf = s.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(
      conf.get("hadoop.tmp.dir", "/tmp"),
      s"graft_$prefix-${java.util.UUID.randomUUID()}")
    val fs = base.getFileSystem(conf)
    fs.mkdirs(base)
    org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
      new Runnable {
        override def run(): Unit =
          try fs.delete(base, true)
          catch { case _: java.io.IOException => () } // FS gone: nothing to leak
      },
      org.apache.hadoop.fs.FileSystem.SHUTDOWN_HOOK_PRIORITY + 10)
    base.toString
  }
}
