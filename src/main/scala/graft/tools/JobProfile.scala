package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev diagnostic: per-JOB wall-clock breakdown of one registry query —
  * where the seconds of a composite operator actually go (layout
  * builds, trigger drains, count actions), which TimeQueries' single
  * end-to-end number cannot show. Runs the query twice and profiles the
  * SECOND (warm) run. Usage:
  *   runMain graft.tools.JobProfile <sfDir> <query> [query ...] */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().collect()

    case class Job(id: Int, start: Long, var end: Long = -1L,
                   var tasks: Int = 0, desc: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val recording = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (recording.get) {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(js.jobId, Job(js.jobId, js.time, desc = d))
        js.stageIds.foreach(sid => stageToJob.put(sid, js.jobId))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId); if (j != null) j.end = je.time
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val jid = stageToJob.getOrDefault(sc.stageInfo.stageId, -1)
        val j = jobs.get(jid)
        if (j != null) {
          j.tasks += sc.stageInfo.numTasks
          val si = sc.stageInfo
          val dur = (for (a <- si.completionTime; b <- si.submissionTime)
            yield (a - b) / 1e3).getOrElse(-1.0)
          if (dur >= 0.2)
            println(f"[prof]     stage ${si.stageId}%4d job $jid%4d ${dur}%7.3f s " +
              f"${si.numTasks}%4d tasks  ${si.name.takeWhile(_ != '\n').take(70)}")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm run (layout caches, codegen)
      jobs.clear()
      recording.set(true)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      recording.set(false)
      org.apache.spark.sql.graftshim.Shims.waitListenerBusEmpty(spark.sparkContext, 10000L)
      val js = jobs.values.toArray(Array.empty[Job]).sortBy(_.start)
      println(f"[prof] $n wall=${wall}%.3f s, ${js.length} jobs")
      val sum = js.map(j => math.max(0L, j.end - j.start)).sum / 1e3
      println(f"[prof]   sum(job wall)=${sum}%.3f s (gaps = driver-side work)")
      var prevEnd = 0L
      js.foreach { j =>
        val dur = (j.end - j.start) / 1e3
        val gap = if (prevEnd == 0L) 0.0 else (j.start - prevEnd) / 1e3
        prevEnd = math.max(prevEnd, j.end)
        val tag = if (j.desc.length > 60) j.desc.take(60) else j.desc
        if (dur >= 0.01 || gap >= 0.01)
          println(f"[prof]   job ${j.id}%4d ${dur}%7.3f s  gap=${gap}%6.3f  $tag")
      }
    }
    spark.stop()
  }
}
