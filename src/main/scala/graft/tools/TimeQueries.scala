package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated per-query timer: Bench's warm-up + min-of-3 protocol for a
  * named subset, without the other 200 queries contending on the same
  * JVM — the tool for adjudicating cross-round bench outliers. Usage:
  * runMain graft.tools.TimeQueries <sfDir> <query> [query ...] */
object TimeQueries {
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
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val ts = Seq(time(fn), time(fn), time(fn))
      println(f"[time] $n%-24s min=${ts.min}%.3f s  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
